"""Rigid+scale scene normalization.

Capability equivalent of /root/reference/splat_trainer/dataset/
normalization.py:18-95: translate the scene so the camera centroid sits at
the origin, optionally scale by 1/median-kNN camera distance; forward and
inverse transforms for clouds, gaussians, cameras and rigid matrices.
Outputs (ply, cameras.json) are un-normalized on save.
"""

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class NormalizationConfig:
    centering: bool = True
    scaling_method: str = "none"   # "none" | "median_knn"
    normalize_knn: int = 20


@dataclass(frozen=True)
class Normalization:
    """x_normalized = (x + translation) * scale"""
    translation: np.ndarray  # (3,)
    scale: float = 1.0

    @staticmethod
    def identity() -> "Normalization":
        return Normalization(translation=np.zeros(3, np.float32), scale=1.0)

    @staticmethod
    def from_cameras(config: NormalizationConfig,
                     camera_positions: np.ndarray) -> "Normalization":
        translation = (-camera_positions.mean(axis=0)
                       if config.centering else np.zeros(3, np.float32))
        scale = 1.0
        if config.scaling_method == "median_knn" and camera_positions.shape[0] > 1:
            k = min(config.normalize_knn, camera_positions.shape[0] - 1)
            d = np.linalg.norm(
                camera_positions[:, None] - camera_positions[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            knn = np.sort(d, axis=1)[:, :k].mean(axis=1)
            scale = 1.0 / max(float(np.median(knn)), 1e-12)
        return Normalization(translation=translation.astype(np.float32),
                             scale=float(scale))

    @property
    def inverse(self) -> "Normalization":
        return Normalization(translation=-self.translation * self.scale,
                             scale=1.0 / self.scale)

    def transform_points(self, points):
        return (points + np.asarray(self.translation)) * self.scale

    def transform_cloud(self, cloud):
        from splat_trainer_tpu.utils.pointcloud import PointCloud
        return PointCloud(points=self.transform_points(cloud.points),
                          colors=cloud.colors)

    def transform_rigid(self, camera_t_world: np.ndarray) -> np.ndarray:
        """world->camera matrices for the normalized world frame.

        Camera centers move with the scene similarity: pos' = (pos + T) s,
        rotation unchanged. With t = -R pos this gives t' = s (t - R T).
        """
        m = np.array(camera_t_world, np.float32, copy=True)
        r = m[..., :3, :3]
        t = m[..., :3, 3]
        rT = np.einsum("...ij,j->...i", r, np.asarray(self.translation))
        m[..., :3, 3] = self.scale * (t - rT)
        return m

    def transform_gaussians(self, gaussians):
        """Gaussians3D (jnp pytree) — translate + scale positions/scales."""
        import jax.numpy as jnp
        return gaussians.replace(
            position=(gaussians.position + jnp.asarray(self.translation)) * self.scale,
            log_scaling=gaussians.log_scaling + jnp.log(self.scale),
        )
