"""Synthetic in-memory dataset: a random gaussian scene rendered as ground
truth. Used by tests and benchmarks — serves the role of the reference's
random-data fixtures (SURVEY.md §4) at the Dataset level.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable, Label, MultiCameraTable
from splat_trainer_tpu.core.types import Gaussians3D, RasterConfig
from splat_trainer_tpu.data import dataset as ds
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.utils import transforms
from splat_trainer_tpu.utils.pointcloud import PointCloud


def _random_gaussians(key, n, extent=1.0):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return Gaussians3D(
        position=jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent),
        rotation=transforms.normalize(jax.random.normal(k2, (n, 4))),
        log_scaling=jax.random.uniform(k3, (n, 3), minval=-4.5, maxval=-2.0)
        + jnp.log(extent),
        alpha_logit=jax.random.uniform(k4, (n, 1), minval=-1.0, maxval=3.0),
        feature=jax.random.uniform(k5, (n, 3)),
    )


def _orbit_pose(angle: float, elevation: float, radius: float) -> np.ndarray:
    eye = np.array([radius * np.cos(angle) * np.cos(elevation),
                    radius * np.sin(elevation),
                    radius * np.sin(angle) * np.cos(elevation)], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R_cw = np.stack([right, up, fwd], axis=1).T
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R_cw
    m[:3, 3] = -R_cw @ eye
    return m


class SyntheticDataset(ds.Dataset):
    """Orbit cameras around a random gaussian scene, images rendered with
    the dense oracle."""

    def __init__(self, num_images: int = 12, image_size=(64, 64),
                 num_points: int = 300, seed: int = 0, split_every: int = 4,
                 radius: float = 4.0, fov_deg: float = 50.0):
        key = jax.random.PRNGKey(seed)
        self.gaussians = _random_gaussians(key, num_points)
        self._image_size = tuple(image_size)

        w, h = image_size
        fx = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
        intr = np.tile(np.array([fx, fx, w / 2, h / 2], np.float32)[None],
                       (num_images, 1))
        angles = np.linspace(0, 2 * np.pi, num_images, endpoint=False)
        poses = np.stack([_orbit_pose(a, 0.3, radius) for a in angles])

        train_idx, val_idx = ds.split_train_val(num_images, split_every)
        labels = np.where(np.isin(np.arange(num_images), val_idx),
                          Label.Validation.value, Label.Training.value)
        self._camera_table = MultiCameraTable(
            camera_t_world=poses, intrinsics=intr,
            camera_idx=np.zeros(num_images, int), labels=labels,
            image_size=self._image_size, depth_range=(0.1, 100.0),
            image_names=[f"synthetic_{i:03d}.png" for i in range(num_images)])
        self._train_idx, self._val_idx = train_idx, val_idx

        cfg = RasterConfig(backend="dense", max_instances=1 << 14, chunk_size=16)
        self._images = []
        for i in range(num_images):
            cam = self._camera_table.camera_params(i)
            r = renderer.render_gaussians(
                self.gaussians, self.gaussians.feature, cam, cfg)
            img = np.asarray(jnp.clip(r.image, 0, 1) * 255).astype(np.uint8)
            self._images.append(img)

    def loader(self, idx: Sequence[int]) -> List[ds.ImageView]:
        return [ds.ImageView(filename=f"synthetic_{i:03d}.png",
                             image_idx=int(i), image=self._images[int(i)])
                for i in np.atleast_1d(idx)]

    def train(self, shuffle: bool = False) -> List[ds.ImageView]:
        idx = (np.random.permutation(self._train_idx) if shuffle
               else self._train_idx)
        return self.loader(idx)

    def val(self) -> List[ds.ImageView]:
        return self.loader(self._val_idx)

    @property
    def camera_table(self) -> CameraTable:
        return self._camera_table

    def pointcloud(self) -> Optional[PointCloud]:
        return PointCloud(points=np.asarray(self.gaussians.position),
                          colors=np.asarray(self.gaussians.feature[:, :3]))
