"""Multi-camera rig scan dataset with undistortion.

Capability equivalent of /root/reference/splat_trainer/dataset/scan/
dataset.py:31-156 + scan/loading.py:74-156: a camera rig (shared per-camera
intrinsics/extrinsics) captured over many frames, undistorted on load,
exposed through a CameraRigTable with frame-level train/val splits
(2-frame edge padding) and parallel image preloading.

The reference reads a proprietary `camera_geometry` FrameSet; that package
isn't available, so this reader defines an equivalent open layout:

    scan.json:
      {"cameras": {name: {"width", "height",
                          "K": 3x3, "dist": [k1 k2 p1 p2 k3],
                          "camera_t_rig": 4x4}},
       "frames": [{"rig_t_world": 4x4,
                   "images": {camera_name: relative_path}}, ...],
       "cloud": "sparse.ply"            # optional initial point cloud
      }
"""

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from splat_trainer_tpu.cameras.camera_table import CameraRigTable, CameraTable, Label
from splat_trainer_tpu.data import dataset as ds
from splat_trainer_tpu.data.normalization import Normalization, NormalizationConfig
from splat_trainer_tpu.utils.pointcloud import PointCloud, load_ply_cloud


class RigScanDataset(ds.Dataset):
    def __init__(self, scan_file: str, image_scale: float = 1.0,
                 val_stride: int = 8, depth_range=(0.1, 100.0),
                 normalize: NormalizationConfig = NormalizationConfig(),
                 limit_frames: Optional[int] = None):
        self.base = os.path.dirname(os.path.abspath(scan_file))
        with open(scan_file) as f:
            scan = json.load(f)

        cam_names = sorted(scan["cameras"].keys())
        cams = [scan["cameras"][n] for n in cam_names]
        frames = scan["frames"][:limit_frames] if limit_frames else scan["frames"]

        w0, h0 = cams[0]["width"], cams[0]["height"]
        self._image_size = (round(w0 * image_scale), round(h0 * image_scale))

        # undistortion maps + scaled pinhole intrinsics per camera
        import cv2
        self._maps, intr = [], []
        for c in cams:
            K = np.asarray(c["K"], np.float64)
            dist = np.asarray(c.get("dist", [0, 0, 0, 0, 0]), np.float64)
            newK, _ = cv2.getOptimalNewCameraMatrix(
                K, dist, (c["width"], c["height"]), alpha=0)
            m1, m2 = cv2.initUndistortRectifyMap(
                K, dist, None, newK, (c["width"], c["height"]), cv2.CV_32FC1)
            self._maps.append((m1, m2))
            s = image_scale
            intr.append([newK[0, 0] * s, newK[1, 1] * s,
                         newK[0, 2] * s, newK[1, 2] * s])

        camera_t_rig = np.stack(
            [np.asarray(c["camera_t_rig"], np.float32) for c in cams])
        rig_t_world = np.stack(
            [np.asarray(fr["rig_t_world"], np.float32) for fr in frames])

        # normalization from rig positions
        r = rig_t_world[:, :3, :3]
        t = rig_t_world[:, :3, 3]
        centers = -np.einsum("nij,ni->nj", r, t)
        self._normalization = Normalization.from_cameras(normalize, centers)
        rig_t_world = self._normalization.transform_rigid(rig_t_world)

        # frame-level split with 2-frame edge padding (scan/dataset.py:77-81)
        nf, nc = len(frames), len(cams)
        val_frames = (np.arange(2, nf - 2)[::val_stride]
                      if nf > 4 and val_stride > 0 else np.array([], int))
        labels = np.full(nf * nc, Label.Training.value)
        for f in val_frames:
            labels[f * nc:(f + 1) * nc] = Label.Validation.value

        names = [f"{fr.get('name', fi):>06}/{cn}"
                 for fi, fr in enumerate(frames) for cn in cam_names]
        self._camera_table = CameraRigTable(
            rig_t_world=rig_t_world, camera_t_rig=camera_t_rig,
            intrinsics=np.asarray(intr, np.float32), labels=labels,
            image_size=self._image_size,
            depth_range=(depth_range[0] * self._normalization.scale,
                         depth_range[1] * self._normalization.scale),
            image_names=names)

        self._paths = [os.path.join(self.base, fr["images"][cn])
                       for fr in frames for cn in cam_names]
        self._cam_of_image = [ci for _f in frames for ci in range(nc)]
        idx = np.arange(nf * nc)
        self._train_idx = idx[labels == Label.Training.value]
        self._val_idx = idx[labels == Label.Validation.value]
        self._cloud_path = (os.path.join(self.base, scan["cloud"])
                            if "cloud" in scan else None)
        self._images_cache = None

    def __repr__(self):
        return (f"RigScanDataset({self.base}, {len(self._paths)} images "
                f"@ {self._image_size})")

    def load_images(self):
        if self._images_cache is not None:
            return
        import cv2

        def load(i):
            img = cv2.imread(self._paths[i], cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(self._paths[i])
            m1, m2 = self._maps[self._cam_of_image[i]]
            img = cv2.remap(img, m1, m2, cv2.INTER_LINEAR)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if (img.shape[1], img.shape[0]) != self._image_size:
                img = cv2.resize(img, self._image_size,
                                 interpolation=cv2.INTER_AREA)
            return np.ascontiguousarray(img)

        with ThreadPoolExecutor(max_workers=8) as pool:
            self._images_cache = list(pool.map(load, range(len(self._paths))))

    def loader(self, idx: Sequence[int]) -> List[ds.ImageView]:
        self.load_images()
        return [ds.ImageView(
            filename=self._camera_table.image_names[int(i)],
            image_idx=int(i), image=self._images_cache[int(i)])
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
        if self._cloud_path and os.path.exists(self._cloud_path):
            return self._normalization.transform_cloud(
                load_ply_cloud(self._cloud_path))
        return None

    @property
    def to_original(self) -> Normalization:
        return self._normalization.inverse
