"""Point-visibility queries against camera tables, pure jnp.

Capability equivalent of /root/reference/splat_trainer/visibility/
query_points.py:40-214: project points into all cameras to count view
overlap, crop clouds to visible frustums, and generate random/balanced
point clouds by unprojecting random NDC depths (inverse-NDC distribution,
so samples concentrate near the cameras).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.cameras.camera_table import Cameras
from splat_trainer_tpu.ops.projection import inverse_ndc_depth


def project_points(cameras: Cameras, image_size, points: jnp.ndarray):
    """Project (N, 3) points into all cameras.

    Returns (uv (C, N, 2), depth (C, N), in_view (C, N) bool).
    """
    r = cameras.camera_t_world[:, :3, :3]
    t = cameras.camera_t_world[:, :3, 3]
    pc = jnp.einsum("cij,nj->cni", r, points) + t[:, None, :]
    z = pc[..., 2]
    safe_z = jnp.maximum(z, 1e-6)

    fx, fy, cx, cy = (cameras.intrinsics[:, i:i + 1] for i in range(4))
    u = fx * pc[..., 0] / safe_z + cx
    v = fy * pc[..., 1] / safe_z + cy

    w, h = image_size
    near = cameras.depth_range[:, 0:1]
    far = cameras.depth_range[:, 1:2]
    in_view = ((z > near) & (z < far)
               & (u >= 0) & (u < w) & (v >= 0) & (v < h))
    return jnp.stack([u, v], axis=-1), z, in_view


def point_visibility(cameras: Cameras, image_size, points: jnp.ndarray) -> jnp.ndarray:
    """Number of cameras seeing each point (query_points.py:89-113)."""
    _, _, in_view = project_points(cameras, image_size, points)
    return in_view.sum(axis=0)


def crop_cloud_mask(cameras: Cameras, image_size, points: jnp.ndarray,
                    min_views: int = 1) -> jnp.ndarray:
    """Mask of points visible in at least `min_views` cameras
    (query_points.py:40)."""
    return point_visibility(cameras, image_size, points) >= min_views


def random_points(key, cameras: Cameras, image_size, n: int,
                  clamp_near: float = 0.0) -> jnp.ndarray:
    """Random points by unprojecting random pixels at inverse-NDC random
    depths from random cameras (query_points.py:105-137)."""
    k1, k2, k3 = jax.random.split(key, 3)
    num_cams = cameras.num_images
    cam_idx = jax.random.randint(k1, (n,), 0, num_cams)

    w, h = image_size
    uv = jax.random.uniform(k2, (n, 2)) * jnp.array([w, h])
    ndc = jax.random.uniform(k3, (n,))

    near = jnp.maximum(cameras.depth_range[cam_idx, 0], clamp_near)
    far = cameras.depth_range[cam_idx, 1]
    depth = inverse_ndc_depth(ndc, near, far)

    intr = cameras.intrinsics[cam_idx]
    x = (uv[:, 0] - intr[:, 2]) / intr[:, 0] * depth
    y = (uv[:, 1] - intr[:, 3]) / intr[:, 1] * depth
    pc = jnp.stack([x, y, depth], axis=-1)

    m = cameras.camera_t_world[cam_idx]
    r, t = m[:, :3, :3], m[:, :3, 3]
    # world = R^T (pc - t)
    return jnp.einsum("nij,ni->nj", r, pc - t)


def balanced_points(key, cameras: Cameras, image_size, n: int,
                    min_view_overlap: int = 4, clamp_near: float = 0.0,
                    oversample: int = 4) -> jnp.ndarray:
    """Random points filtered to a minimum view overlap, balanced across
    cameras (query_points.py:141-174). Static-shape version: oversample,
    rank candidates by (meets-overlap, per-camera balance), take top n."""
    k1, k2 = jax.random.split(key)
    cand = random_points(k1, cameras, image_size, n * oversample, clamp_near)
    overlap = point_visibility(cameras, image_size, cand)
    good = overlap >= min_view_overlap
    # prefer well-overlapped points; break ties randomly
    score = good.astype(jnp.float32) + jax.random.uniform(k2, (cand.shape[0],))
    _, idx = jax.lax.top_k(score, n)
    return cand[idx]


def foreground_mask(cameras: Cameras, points: jnp.ndarray,
                    quantile: float = 0.25,
                    active: jnp.ndarray | None = None) -> jnp.ndarray:
    """Foreground = points closer than a depth quantile in some view
    (query_points.py:190-214). `active` excludes unused capacity slots
    from the quantile estimate."""
    r = cameras.camera_t_world[:, :3, :3]
    t = cameras.camera_t_world[:, :3, 3]
    z = jnp.einsum("cij,nj->cni", r, points)[..., 2] + t[:, 2:3]
    zq = z if active is None else jnp.where(active[None], z, jnp.nan)
    thresh = jnp.nanquantile(zq, quantile, axis=1, keepdims=True)
    return ((z > 0) & (z < thresh)).any(axis=0)
