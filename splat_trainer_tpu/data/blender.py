"""NeRF-synthetic (Blender) dataset — used for the lego benchmark milestone
(BASELINE.md config 2). Not present in the reference (which ingests COLMAP
and rig scans); added here because the baseline milestones call for it.

transforms_{split}.json: camera_angle_x + frames with OpenGL-convention
camera-to-world matrices. Converted to +z-forward world->camera.
"""

import json
import os
from typing import List, Optional, Sequence

import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraTable, Label, MultiCameraTable
from splat_trainer_tpu.data import dataset as ds
from splat_trainer_tpu.utils.pointcloud import PointCloud

# OpenGL (-z forward, y up) -> CV (+z forward, y down) camera axes
_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


class BlenderDataset(ds.Dataset):
    def __init__(self, base_path: str, image_scale: float = 1.0,
                 white_background: bool = True, depth_range=(0.5, 20.0),
                 val_split: str = "val", limit_images: Optional[int] = None):
        self.base_path = base_path
        self.white_background = white_background

        def load_split(split):
            with open(os.path.join(base_path, f"transforms_{split}.json")) as f:
                meta = json.load(f)
            return meta

        train_meta = load_split("train")
        try:
            val_meta = load_split(val_split)
        except FileNotFoundError:
            val_meta = {"camera_angle_x": train_meta["camera_angle_x"], "frames": []}

        frames = train_meta["frames"] + val_meta["frames"]
        if limit_images:
            n_tr = min(limit_images, len(train_meta["frames"]))
            n_va = min(max(limit_images // 8, 1), len(val_meta["frames"]))
            frames = train_meta["frames"][:n_tr] + val_meta["frames"][:n_va]
            train_count = n_tr
        else:
            train_count = len(train_meta["frames"])

        self._paths = [os.path.join(base_path, fr["file_path"] + ".png")
                       for fr in frames]
        self._image_names = [fr["file_path"] for fr in frames]

        import cv2
        probe = cv2.imread(self._paths[0], cv2.IMREAD_UNCHANGED)
        h, w = probe.shape[:2]
        self._image_size = (round(w * image_scale), round(h * image_scale))

        fx = 0.5 * self._image_size[0] / np.tan(0.5 * train_meta["camera_angle_x"])
        intr = np.tile(np.array(
            [fx, fx, self._image_size[0] / 2, self._image_size[1] / 2],
            np.float32)[None], (len(frames), 1))

        poses = []
        for fr in frames:
            c2w = np.array(fr["transform_matrix"], np.float32) @ _GL_TO_CV
            w2c = np.linalg.inv(c2w)
            poses.append(w2c)
        poses = np.stack(poses)

        labels = np.full(len(frames), Label.Training.value)
        labels[train_count:] = Label.Validation.value

        self._camera_table = MultiCameraTable(
            camera_t_world=poses, intrinsics=intr,
            camera_idx=np.zeros(len(frames), int), labels=labels,
            image_size=self._image_size, depth_range=depth_range,
            image_names=self._image_names)
        self._train_idx = np.arange(train_count)
        self._val_idx = np.arange(train_count, len(frames))
        self._images_cache = None

    def __repr__(self):
        return (f"BlenderDataset({self.base_path}, {len(self._paths)} images "
                f"@ {self._image_size})")

    def load_images(self):
        if self._images_cache is not None:
            return
        import cv2

        def load(path):
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img.shape[-1] == 4:
                img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
                rgb = img[..., :3].astype(np.float32)
                a = img[..., 3:4].astype(np.float32) / 255.0
                bg = 255.0 if self.white_background else 0.0
                img = (rgb * a + bg * (1 - a)).astype(np.uint8)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if (img.shape[1], img.shape[0]) != self._image_size:
                img = cv2.resize(img, self._image_size, interpolation=cv2.INTER_AREA)
            return np.ascontiguousarray(img)

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=8) as pool:
            self._images_cache = list(pool.map(load, self._paths))

    def loader(self, idx: Sequence[int]) -> List[ds.ImageView]:
        self.load_images()
        return [ds.ImageView(filename=self._image_names[i], image_idx=int(i),
                             image=self._images_cache[i])
                for i in np.atleast_1d(idx)]

    def train(self, shuffle: bool = False) -> List[ds.ImageView]:
        idx = np.random.permutation(self._train_idx) if shuffle else self._train_idx
        return self.loader(idx)

    def val(self) -> List[ds.ImageView]:
        return self.loader(self._val_idx)

    @property
    def camera_table(self) -> CameraTable:
        return self._camera_table

    def pointcloud(self) -> Optional[PointCloud]:
        return None  # synthetic scenes start from random points
