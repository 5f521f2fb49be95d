"""Large tiled rendering + automatic scene-framing camera.

Capability equivalent of /root/reference/splat_trainer/scripts/
render_image.py:27-112 (`render_tiled` 2048^2 crops by principal-point
shifting; `frame_scene` overview camera via plane fit + look_at). Tiled
rendering is the existing proof that compositing decomposes over pixel
crops (SURVEY.md §5.7) — each crop is a full render with a shifted cx/cy.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import CameraParams, RasterConfig


def crop_camera(camera: CameraParams, offset: Tuple[int, int],
                size: Tuple[int, int]) -> CameraParams:
    """Sub-image camera by shifting the principal point."""
    fx, fy, cx, cy = (float(np.asarray(camera.projection)[i]) for i in range(4))
    ox, oy = offset
    return CameraParams(
        T_camera_world=camera.T_camera_world,
        projection=jnp.asarray([fx, fy, cx - ox, cy - oy], jnp.float32),
        near_plane=camera.near_plane,
        far_plane=camera.far_plane,
        image_size=size,
        # Jacobian frustum clamp stays in the full frame (crop-exactness)
        clip_size=camera.clip_size or camera.image_size,
    )


def render_tiled(render_fn, camera: CameraParams, tile: int = 1024):
    """Render an arbitrarily large image in crops.

    render_fn(camera) -> (H, W, C) image for a (small) camera. Crops share
    compiled shapes when the image divides evenly into `tile`.
    """
    w, h = camera.image_size
    out = None
    for oy in range(0, h, tile):
        for ox in range(0, w, tile):
            cw, ch = min(tile, w - ox), min(tile, h - oy)
            img = np.asarray(render_fn(crop_camera(camera, (ox, oy), (cw, ch))))
            if out is None:
                out = np.zeros((h, w, img.shape[-1]), img.dtype)
            out[oy:oy + ch, ox:ox + cw] = img
    return out


def frame_scene(points: np.ndarray, image_size=(2048, 1536), fov_deg: float = 50.0,
                up_hint=(0.0, 1.0, 0.0), margin: float = 1.2) -> CameraParams:
    """Overview camera: fit a plane to the points, look at the centroid from
    along the plane normal at a distance framing the whole cloud
    (reference frame_scene, render_image.py:68-112)."""
    pts = np.asarray(points)
    centroid = pts.mean(axis=0)
    centered = pts - centroid
    # plane normal = smallest principal axis
    cov = centered.T @ centered / max(len(pts), 1)
    _w, v = np.linalg.eigh(cov)
    normal = v[:, 0]
    if np.dot(normal, np.asarray(up_hint)) < 0:
        normal = -normal

    radius = np.percentile(np.linalg.norm(centered, axis=1), 95) * margin
    dist = radius / np.tan(np.radians(fov_deg) / 2)
    eye = centroid + normal * dist

    fwd = (centroid - eye)
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up_hint, np.float64)
    if abs(np.dot(fwd, up)) > 0.95:
        up = v[:, 1]
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.stack([right, up, fwd], axis=1).T
    T[:3, 3] = -T[:3, :3] @ eye.astype(np.float32)

    w, h = image_size
    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    return CameraParams.create(
        T, [fx, fx, w / 2, h / 2], image_size,
        near_plane=dist * 0.01, far_plane=dist * 10.0)
