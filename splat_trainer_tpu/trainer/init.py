"""Initial gaussian cloud construction.

Capability equivalent of /root/reference/splat_trainer/trainer/init.py:13-51
+ gaussians/loading.py:23-66: crop the dataset cloud to the visible
frustums, subsample to `limit_points`, top up with random points balanced
across cameras, estimate per-point scale by mean kNN distance, constant
initial alpha.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable
from splat_trainer_tpu.core.types import Gaussians3D
from splat_trainer_tpu.ops.knn import knn_distances
from splat_trainer_tpu.utils.misc import inverse_sigmoid
from splat_trainer_tpu.visibility.query_points import balanced_points, crop_cloud_mask


@dataclass(frozen=True)
class CloudInitConfig:
    """Mirrors reference CloudInitConfig (trainer/config.py:26-35)."""
    num_neighbors: int = 5
    initial_point_scale: float = 0.2
    initial_alpha: float = 0.4
    initial_points: Optional[int] = 300_000
    limit_points: Optional[int] = 150_000
    min_view_overlap: int = 4
    clamp_near: float = 1.0


def from_scaled_pointcloud(points: jnp.ndarray, colors: Optional[jnp.ndarray],
                           scales: jnp.ndarray, initial_alpha: float,
                           feature_dim: int = 3) -> Gaussians3D:
    """Isotropic gaussians from points + scales (gaussians/loading.py:23-43)."""
    n = points.shape[0]
    rotation = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (n, 1))
    log_scaling = jnp.log(jnp.maximum(scales, 1e-8))[:, None].repeat(3, axis=1)
    alpha_logit = jnp.full((n, 1), float(inverse_sigmoid(initial_alpha)))
    if colors is None:
        colors = jnp.full((n, feature_dim), 0.5)
    return Gaussians3D(position=points, rotation=rotation,
                       log_scaling=log_scaling, alpha_logit=alpha_logit,
                       feature=colors)


def estimate_scale(points: jnp.ndarray, num_neighbors: int = 5) -> jnp.ndarray:
    """Mean kNN distance per point (gaussians/loading.py:45-61, pykeops
    replaced by the blocked MXU kNN)."""
    return knn_distances(points, num_neighbors)


def get_initial_gaussians(config: CloudInitConfig, camera_table: CameraTable,
                          cloud, key: jax.Array) -> Gaussians3D:
    """Build the initial cloud (reference get_initial_gaussians, init.py:13-51).

    `cloud` is the dataset PointCloud or None (synthetic scenes).
    """
    k1, k2 = jax.random.split(key)
    cams = camera_table.cameras
    image_size = camera_table.image_size

    points_list, colors_list = [], []
    if cloud is not None and cloud.num_points > 0:
        pts = jnp.asarray(cloud.points)
        mask = np.asarray(crop_cloud_mask(cams, image_size, pts, min_views=1))
        pts = np.asarray(cloud.points)[mask]
        cols = (np.asarray(cloud.colors)[mask]
                if cloud.colors is not None else None)

        if config.limit_points is not None and pts.shape[0] > config.limit_points:
            sel = np.random.RandomState(0).choice(
                pts.shape[0], config.limit_points, replace=False)
            pts, cols = pts[sel], (cols[sel] if cols is not None else None)
        points_list.append(pts)
        colors_list.append(cols if cols is not None
                           else np.full((pts.shape[0], 3), 0.5, np.float32))

    n_have = sum(p.shape[0] for p in points_list)
    n_random = max((config.initial_points or 0) - n_have, 0)
    if n_random > 0:
        rand = balanced_points(
            k1, cams, image_size, n_random,
            min_view_overlap=config.min_view_overlap,
            clamp_near=config.clamp_near)
        points_list.append(np.asarray(rand))
        colors_list.append(np.full((n_random, 3), 0.5, np.float32))

    points = jnp.asarray(np.concatenate(points_list, axis=0), jnp.float32)
    colors = jnp.asarray(np.concatenate(colors_list, axis=0), jnp.float32)

    scales = estimate_scale(points, config.num_neighbors) * config.initial_point_scale
    return from_scaled_pointcloud(points, colors, scales, config.initial_alpha)
