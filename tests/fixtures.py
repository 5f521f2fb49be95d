"""Random-scene fixture generators (reference uses
taichi_splatting.tests.random_data equivalents; see SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import CameraParams, Gaussians3D
from splat_trainer_tpu.utils import transforms


def random_gaussians(key, n: int, feature_dim: int = 3, extent: float = 1.0) -> Gaussians3D:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return Gaussians3D(
        position=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        rotation=transforms.normalize(jax.random.normal(k2, (n, 4))),
        log_scaling=jax.random.uniform(k3, (n, 3), minval=-4.5, maxval=-2.0)
        + jnp.log(extent),
        alpha_logit=jax.random.uniform(k4, (n, 1), minval=-1.0, maxval=3.0),
        feature=jax.random.uniform(k5, (n, feature_dim)),
    )


def look_at_camera(image_size=(64, 64), eye=(0.0, 0.0, -4.0), fov_deg=50.0,
                   near=0.1, far=100.0) -> CameraParams:
    """Simple camera at `eye` looking at the origin (+z forward)."""
    w, h = image_size
    eye = np.asarray(eye, np.float32)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(np.dot(fwd, up)) > 0.99:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)

    R_wc = np.stack([right, up, fwd], axis=1)  # camera -> world
    R_cw = R_wc.T
    t_cw = -R_cw @ eye
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R_cw
    T[:3, 3] = t_cw

    fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    projection = [fx, fx, w / 2, h / 2]
    return CameraParams.create(T, projection, image_size, near, far)
