"""COLMAP dataset: reconstruction ingestion + image loading.

Capability equivalent of /root/reference/splat_trainer/dataset/colmap/
dataset.py:68-226: per-camera intrinsics table + per-image poses, image
scaling (`image_scale` xor `resize_longest`), scene normalization from the
camera centroid, stride train/val split (`split_every`), threaded cv2 image
loading, and the sparse point cloud from points3D.
"""

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable, Label, MultiCameraTable
from splat_trainer_tpu.data import dataset as ds
from splat_trainer_tpu.data.colmap import reader
from splat_trainer_tpu.data.normalization import Normalization, NormalizationConfig
from splat_trainer_tpu.utils.pointcloud import PointCloud


def _load_image(path: str, target_size) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if (img.shape[1], img.shape[0]) != tuple(target_size):
        img = cv2.resize(img, tuple(target_size), interpolation=cv2.INTER_AREA)
    return np.ascontiguousarray(img)


class COLMAPDataset(ds.Dataset):
    def __init__(
        self,
        base_path: str,
        image_dir: str = "images",
        image_scale: Optional[float] = None,
        resize_longest: Optional[int] = 1536,
        split_every: int = 8,
        depth_range=(0.1, 100.0),
        normalize: NormalizationConfig = NormalizationConfig(),
        limit_images: Optional[int] = None,
    ):
        assert image_scale is None or resize_longest is None, \
            "set image_scale xor resize_longest"
        self.base_path = base_path
        self.image_dir = os.path.join(base_path, image_dir)

        model = reader.load_model(base_path)
        images = model.images[:limit_images] if limit_images else model.images
        self._image_names = [im.name for im in images]

        # common target size from the first camera (datasets are resized to
        # one size so render shapes stay static)
        cam0 = model.cameras[images[0].camera_id]
        w, h = cam0.width, cam0.height
        if resize_longest is not None:
            scale = resize_longest / max(w, h)
        else:
            scale = image_scale or 1.0
        self._image_size = (round(w * scale), round(h * scale))
        sx = self._image_size[0] / w
        sy = self._image_size[1] / h

        # per-image pose + intrinsics (scaled)
        cam_ids = sorted(model.cameras.keys())
        cam_rank = {cid: i for i, cid in enumerate(cam_ids)}
        intr = np.stack([
            model.cameras[im.camera_id].pinhole_intrinsics() for im in images])
        intr = intr * np.array([sx, sy, sx, sy], np.float32)
        poses = np.stack([im.camera_t_world() for im in images])
        camera_idx = np.array([cam_rank[im.camera_id] for im in images])

        # scene normalization from camera centers
        r = poses[:, :3, :3]
        t = poses[:, :3, 3]
        centers = -np.einsum("nij,ni->nj", r, t)
        self._normalization = Normalization.from_cameras(normalize, centers)
        poses = self._normalization.transform_rigid(poses)

        train_idx, val_idx = ds.split_train_val(len(images), split_every)
        labels = np.where(np.isin(np.arange(len(images)), val_idx),
                          Label.Validation.value, Label.Training.value)

        self._camera_table = MultiCameraTable(
            camera_t_world=poses, intrinsics=intr, camera_idx=camera_idx,
            labels=labels, image_size=self._image_size,
            depth_range=(depth_range[0] * self._normalization.scale,
                         depth_range[1] * self._normalization.scale),
            image_names=self._image_names)
        self._train_idx, self._val_idx = train_idx, val_idx

        self._points = model.points
        self._colors = model.colors
        self._images_cache: Optional[List[np.ndarray]] = None

    def __repr__(self):
        return (f"COLMAPDataset({self.base_path}, {len(self._image_names)} images "
                f"@ {self._image_size})")

    # -- images -----------------------------------------------------------

    def load_images(self):
        if self._images_cache is None:
            paths = [os.path.join(self.image_dir, n) for n in self._image_names]
            with ThreadPoolExecutor(max_workers=8) as pool:
                self._images_cache = list(
                    pool.map(lambda p: _load_image(p, self._image_size), paths))

    def loader(self, idx: Sequence[int]) -> List[ds.ImageView]:
        self.load_images()
        return [ds.ImageView(filename=self._image_names[i], image_idx=int(i),
                             image=self._images_cache[i]) for i in np.atleast_1d(idx)]

    def train(self, shuffle: bool = False) -> List[ds.ImageView]:
        idx = np.random.permutation(self._train_idx) if shuffle else self._train_idx
        return self.loader(idx)

    def val(self) -> List[ds.ImageView]:
        return self.loader(self._val_idx)

    # -- geometry ----------------------------------------------------------

    @property
    def camera_table(self) -> CameraTable:
        return self._camera_table

    def pointcloud(self) -> Optional[PointCloud]:
        if self._points is None:
            return None
        cloud = PointCloud(points=self._points, colors=self._colors)
        return self._normalization.transform_cloud(cloud)

    @property
    def to_original(self) -> Normalization:
        return self._normalization.inverse
