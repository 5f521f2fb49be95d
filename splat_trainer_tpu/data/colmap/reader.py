"""Self-contained COLMAP sparse-reconstruction reader (binary + text).

The reference uses the pycolmap wheel (dataset/colmap/dataset.py:68); that
dependency isn't available here, so we parse the well-documented COLMAP
model format directly with numpy — cameras.bin/txt, images.bin/txt,
points3D.bin/txt.
"""

import os
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

# model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_IDS = {name: mid for mid, (name, _n) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray

    def pinhole_intrinsics(self) -> np.ndarray:
        """[fx, fy, cx, cy]; distortion params are ignored for non-pinhole
        models (the reference only supports PINHOLE, colmap/dataset.py:36)."""
        p = self.params
        if self.model in ("PINHOLE", "OPENCV", "FULL_OPENCV", "OPENCV_FISHEYE",
                          "THIN_PRISM_FISHEYE"):
            return np.array([p[0], p[1], p[2], p[3]], np.float32)
        if self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                          "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE", "FOV"):
            return np.array([p[0], p[0], p[1], p[2]], np.float32)
        raise ValueError(f"unsupported camera model {self.model}")


@dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray   # (4,) wxyz — world->camera rotation
    tvec: np.ndarray   # (3,)
    camera_id: int
    name: str

    def camera_t_world(self) -> np.ndarray:
        w, x, y, z = self.qvec
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r
        m[:3, 3] = self.tvec
        return m


@dataclass
class ColmapModel:
    cameras: Dict[int, ColmapCamera]
    images: List[ColmapImage]            # sorted by name
    points: Optional[np.ndarray]         # (N, 3) float32
    colors: Optional[np.ndarray]         # (N, 3) float32 in [0, 1]


def _read_bytes(f, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_bin(path) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path, "rb") as f:
        (num,) = _read_bytes(f, "<Q")
        for _ in range(num):
            cam_id, model_id, w, h = _read_bytes(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read_bytes(f, f"<{n_params}d"), np.float64)
            cameras[cam_id] = ColmapCamera(cam_id, name, int(w), int(h), params)
    return cameras


def read_images_bin(path) -> List[ColmapImage]:
    # native single-pass mmap parser when built (data/colmap/native.py);
    # the struct loop below is the dependency-free fallback
    from splat_trainer_tpu.data.colmap import native
    nat = native.read_images_bin(path)
    if nat is not None:
        image_ids, qvecs, tvecs, camera_ids, names = nat
        return [ColmapImage(int(image_ids[i]), qvecs[i], tvecs[i],
                            int(camera_ids[i]), names[i])
                for i in range(len(names))]

    images = []
    with open(path, "rb") as f:
        (num,) = _read_bytes(f, "<Q")
        for _ in range(num):
            image_id = _read_bytes(f, "<i")[0]
            qvec = np.array(_read_bytes(f, "<4d"))
            tvec = np.array(_read_bytes(f, "<3d"))
            camera_id = _read_bytes(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n2d,) = _read_bytes(f, "<Q")
            f.seek(24 * n2d, os.SEEK_CUR)  # skip 2D points (x, y, id) * n
            images.append(ColmapImage(image_id, qvec, tvec, camera_id,
                                      name.decode("utf-8")))
    return images


def read_points3d_bin(path):
    # city-scale reconstructions hold millions of variable-length records;
    # the native parser does this in tens of ms vs minutes for the loop below
    from splat_trainer_tpu.data.colmap import native
    nat = native.read_points3d_bin(path)
    if nat is not None:
        return nat

    xyz, rgb = [], []
    with open(path, "rb") as f:
        (num,) = _read_bytes(f, "<Q")
        for _ in range(num):
            _pid = _read_bytes(f, "<Q")
            xyz.append(_read_bytes(f, "<3d"))
            rgb.append(_read_bytes(f, "<3B"))
            _err = _read_bytes(f, "<d")
            (track_len,) = _read_bytes(f, "<Q")
            f.seek(8 * track_len, os.SEEK_CUR)
    return (np.array(xyz, np.float32),
            np.array(rgb, np.float32) / 255.0)


def read_cameras_txt(path) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            w, h = int(parts[2]), int(parts[3])
            params = np.array([float(x) for x in parts[4:]], np.float64)
            cameras[cam_id] = ColmapCamera(cam_id, model, w, h, params)
    return cameras


def read_images_txt(path) -> List[ColmapImage]:
    images = []
    with open(path) as f:
        # metadata and points2D lines alternate; points2D lines may be empty
        lines = [l.rstrip("\n") for l in f if not l.startswith("#")]
    for meta in lines[::2]:
        if not meta.strip():
            continue
        parts = meta.split()
        images.append(ColmapImage(
            image_id=int(parts[0]),
            qvec=np.array([float(x) for x in parts[1:5]]),
            tvec=np.array([float(x) for x in parts[5:8]]),
            camera_id=int(parts[8]),
            name=parts[9]))
    return images


def read_points3d_txt(path):
    xyz, rgb = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            xyz.append([float(x) for x in parts[1:4]])
            rgb.append([float(x) for x in parts[4:7]])
    return np.array(xyz, np.float32), np.array(rgb, np.float32) / 255.0


def find_model_dir(base) -> str:
    """Locate the sparse model: <base>, <base>/sparse/0, or <base>/sparse."""
    for cand in (base, os.path.join(base, "sparse", "0"),
                 os.path.join(base, "sparse")):
        for ext in (".bin", ".txt"):
            if os.path.exists(os.path.join(cand, f"cameras{ext}")):
                return cand
    raise FileNotFoundError(f"no COLMAP model under {base}")


def load_model(base) -> ColmapModel:
    model_dir = find_model_dir(base)

    def path(name, ext):
        return os.path.join(model_dir, f"{name}{ext}")

    if os.path.exists(path("cameras", ".bin")):
        cameras = read_cameras_bin(path("cameras", ".bin"))
        images = read_images_bin(path("images", ".bin"))
        pts = (read_points3d_bin(path("points3D", ".bin"))
               if os.path.exists(path("points3D", ".bin")) else (None, None))
    else:
        cameras = read_cameras_txt(path("cameras", ".txt"))
        images = read_images_txt(path("images", ".txt"))
        pts = (read_points3d_txt(path("points3D", ".txt"))
               if os.path.exists(path("points3D", ".txt")) else (None, None))

    images.sort(key=lambda im: im.name)
    return ColmapModel(cameras=cameras, images=images,
                       points=pts[0], colors=pts[1])
