"""Dataset abstraction (host side).

Capability equivalent of /root/reference/splat_trainer/dataset/dataset.py:
15-51: `ImageView` rows (filename, table index, uint8 HWC image) and the
`Dataset` contract the trainer consumes. Images stay in host numpy; the
trainer uploads + normalizes to [0,1] on device per batch.
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass, replace
from typing import List, Optional, Sequence

import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable
from splat_trainer_tpu.data.normalization import Normalization
from splat_trainer_tpu.utils.pointcloud import PointCloud


@dataclass
class ImageView:
    filename: str
    image_idx: int
    image: np.ndarray  # (H, W, 3) uint8


class Dataset(ABC):
    @abstractmethod
    def loader(self, idx: Sequence[int]) -> List[ImageView]:
        ...

    @abstractmethod
    def train(self, shuffle: bool = False) -> List[ImageView]:
        ...

    @abstractmethod
    def val(self) -> List[ImageView]:
        ...

    @property
    @abstractmethod
    def camera_table(self) -> CameraTable:
        ...

    @abstractmethod
    def pointcloud(self) -> Optional[PointCloud]:
        ...

    def load_images(self):
        """Eagerly load/caches all images (default no-op)."""

    @property
    def to_original(self) -> Normalization:
        """Inverse of the scene normalization applied at load time."""
        return Normalization.identity()


def split_train_val(n: int, split_every: int):
    """Stride-based split (reference dataset/util.py:12): every
    `split_every`-th image is validation."""
    idx = np.arange(n)
    val = idx[::split_every] if split_every > 0 else np.array([], int)
    train = np.setdiff1d(idx, val)
    return train, val
