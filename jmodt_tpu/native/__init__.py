"""Native (C++) data-pipeline runtime with ctypes bindings.

Replaces the reference's numpy per-frame host path (velodyne load +
lidar->rect->image projection + validity filtering,
kitti_dataset.py:219-229 / calibration.py:50-69) with one fused C++ pass
(src/pointcloud.cpp).  Built on first use with g++ (no pip deps); callers
fall back to numpy transparently when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), 'src', 'pointcloud.cpp')
_LIB_PATH = os.path.join(os.path.dirname(__file__), 'libjmodt_native.so')
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           '-o', _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning('native build failed (%s); using numpy fallback', e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (callers must fall back to numpy)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = _LIB_PATH if (os.path.exists(_LIB_PATH)
                         and os.path.getmtime(_LIB_PATH)
                         >= os.path.getmtime(_SRC)) else _build()
    if path is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.load_velodyne.restype = ctypes.c_int64
    lib.load_velodyne.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.project_and_filter.restype = ctypes.c_int64
    lib.project_and_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def load_velodyne(path: str, max_points: int = 300_000
                  ) -> Optional[np.ndarray]:
    """(N, 4) float32 velodyne points, or None if the native lib is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty((max_points, 4), np.float32)
    n = lib.load_velodyne(path.encode(), _fptr(buf), max_points)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n].copy()


def project_and_filter(pts_lidar: np.ndarray, v2c: np.ndarray,
                       r0: np.ndarray, p2: np.ndarray, img_shape,
                       scope=None
                       ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                           np.ndarray]]:
    """Fused lidar->rect->image projection + in-image/in-range filter.

    :param pts_lidar: (N, 4) [x, y, z, intensity]
    :param v2c: (3, 4); r0 (3, 3); p2 (3, 4) from Calibration
    :param img_shape: (H, W[, C]) real image extents
    :param scope: ((x0, x1), (y0, y1), (z0, z1)) or None
    :return: (pts_rect (K, 3), intensity (K,), uv (K, 2)) or None if the
        native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts_lidar, np.float32)
    n = pts.shape[0]
    # rect = R0 @ V2C @ [xyz 1]: precompute the 3x4 product once per frame
    v2c_r0 = np.ascontiguousarray(
        (np.asarray(r0, np.float64) @ np.asarray(v2c, np.float64)))
    p2c = np.ascontiguousarray(np.asarray(p2, np.float64))
    scope_arr = None
    scope_ptr = ctypes.POINTER(ctypes.c_double)()
    if scope is not None:
        scope_arr = np.ascontiguousarray(
            np.asarray(scope, np.float64).reshape(-1))
        scope_ptr = _dptr(scope_arr)
    out_rect = np.empty((n, 3), np.float32)
    out_int = np.empty((n,), np.float32)
    out_uv = np.empty((n, 2), np.float32)
    k = lib.project_and_filter(
        _fptr(pts), n, _dptr(v2c_r0), _dptr(p2c),
        float(img_shape[0]), float(img_shape[1]), scope_ptr,
        _fptr(out_rect), _fptr(out_int), _fptr(out_uv))
    return out_rect[:k].copy(), out_int[:k].copy(), out_uv[:k].copy()
