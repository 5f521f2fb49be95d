"""Point cloud container + ply IO (host side, numpy).

Capability equivalent of the reference PointCloud tensorclass
(/root/reference/splat_trainer/util/pointcloud.py:12) and its ply load/save
(the reference delegates to plyfile/pypcd4, which aren't available here —
we read/write binary-little-endian ply directly with numpy structured
arrays).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class PointCloud:
    points: np.ndarray            # (N, 3) float32
    colors: Optional[np.ndarray]  # (N, 3) float32 in [0,1] or None

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    def __getitem__(self, idx) -> "PointCloud":
        return PointCloud(
            points=self.points[idx],
            colors=self.colors[idx] if self.colors is not None else None)

    def save_ply(self, path):
        fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if self.colors is not None:
            fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        data = np.empty(self.num_points, dtype=fields)
        data["x"], data["y"], data["z"] = self.points.astype(np.float32).T
        if self.colors is not None:
            rgb = np.clip(self.colors * 255.0, 0, 255).astype(np.uint8)
            data["red"], data["green"], data["blue"] = rgb.T
        write_ply_elements(path, "vertex", data)


def write_ply_elements(path, element_name: str, data: np.ndarray):
    """Write a single-element binary-little-endian ply file."""
    type_map = {"f4": "float", "u1": "uchar", "f8": "double",
                "i4": "int", "u4": "uint"}
    lines = ["ply", "format binary_little_endian 1.0",
             f"element {element_name} {data.shape[0]}"]
    for name in data.dtype.names:
        t = data.dtype[name].str.lstrip("<>|=")
        lines.append(f"property {type_map[t]} {name}")
    lines.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(lines).encode("ascii"))
        f.write(data.tobytes())


def read_ply_elements(path):
    """Read a binary or ascii ply file -> (element_name, structured array)."""
    type_map = {
        "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
        "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
        "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
        "uint": "<u4", "uint32": "<u4",
    }
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        elem = next(l for l in header if l.startswith("element")).split()
        name, count = elem[1], int(elem[2])
        props = [(l.split()[2], type_map[l.split()[1]]) for l in header
                 if l.startswith("property") and not l.startswith("property list")]
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=count, ndmin=2)
            data = np.empty(count, dtype=props)
            for i, (pname, _t) in enumerate(props):
                data[pname] = rows[:, i]
        else:
            data = np.frombuffer(
                f.read(count * np.dtype(props).itemsize), dtype=props, count=count)
    return name, data


def load_ply_cloud(path) -> PointCloud:
    _, data = read_ply_elements(path)
    points = np.stack([data["x"], data["y"], data["z"]], axis=-1).astype(np.float32)
    colors = None
    if "red" in (data.dtype.names or ()):
        colors = np.stack([data["red"], data["green"], data["blue"]],
                          axis=-1).astype(np.float32) / 255.0
    return PointCloud(points=points, colors=colors)
