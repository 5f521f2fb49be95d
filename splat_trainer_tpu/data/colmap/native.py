"""ctypes bindings for the native COLMAP parsers (native/colmap_native.cpp).

The reference ingests COLMAP via pycolmap — a C++ library (SURVEY.md N15).
This module provides the same native-speed path for the two hot files
(points3D.bin can hold millions of variable-length records; the pure-Python
struct loop in reader.py costs minutes at city scale, the C++ single-pass
mmap walk costs tens of milliseconds). The shared library is built by
`make -C native`; if it is absent this module attempts ONE quiet g++ build
and otherwise returns None, letting reader.py fall back to pure Python —
no hard native dependency.
"""

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[3] / "native"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _native_dir() / "libsplatnative.so"
    if not so.exists():
        src = _native_dir() / "colmap_native.cpp"
        if not src.exists():
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                 "-o", str(so), str(src)],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.splat_read_points3d.restype = ctypes.c_int64
    lib.splat_read_points3d.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64]
    lib.splat_read_images.restype = ctypes.c_int64
    lib.splat_read_images.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_points3d_bin(path) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(xyz f32 (N,3), rgb f32 (N,3) in [0,1]) or None if native missing."""
    lib = _load()
    if lib is None:
        return None
    pathb = os.fspath(path).encode()
    probe = np.empty((0,), np.float32)
    n = lib.splat_read_points3d(pathb, probe, probe, 0)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    n2 = lib.splat_read_points3d(pathb, xyz.reshape(-1), rgb.reshape(-1), n)
    if n2 != n:
        return None
    return xyz, rgb


def read_images_bin(path) -> Optional[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray, list]]:
    """(image_ids, qvecs wxyz, tvecs, camera_ids, names) or None."""
    lib = _load()
    if lib is None:
        return None
    pathb = os.fspath(path).encode()
    probe_i = np.empty((0,), np.int32)
    probe_d = np.empty((0,), np.float64)
    probe_b = np.empty((0,), np.uint8)
    n = lib.splat_read_images(pathb, probe_i, probe_d, probe_d, probe_i,
                              probe_b, 0)
    if n < 0:
        return None
    image_ids = np.empty((n,), np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    camera_ids = np.empty((n,), np.int32)
    names_raw = np.zeros((n, 256), np.uint8)
    n2 = lib.splat_read_images(pathb, image_ids, qvecs.reshape(-1),
                               tvecs.reshape(-1), camera_ids,
                               names_raw.reshape(-1), n)
    if n2 != n:
        return None
    names = [bytes(row).split(b"\0", 1)[0].decode("utf-8", "replace")
             for row in names_raw]
    return image_ids, qvecs, tvecs, camera_ids, names
