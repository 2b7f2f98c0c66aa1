"""ctypes bindings for the native C++ loader (``loader.cpp``).

The shared library is built lazily with ``make`` on first use (the
environment has no pybind11; a C ABI + ctypes keeps the binding
dependency-free).  If no toolchain is available the Python loader in
``tpuslam.data.loader`` serves as the fallback — it is also the
behavioral oracle the native parser is tested against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpuslam_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        proc = subprocess.run(
            ["make", "-C", _DIR],
            capture_output=True,
            timeout=120,
        )
        return proc.returncode == 0 and os.path.exists(_SO)
    except Exception:  # noqa: BLE001 — no toolchain => fallback
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        for name in ("tpuslam_load_obj", "tpuslam_load_off"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
        for name in ("tpuslam_write_obj", "tpuslam_write_off"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
            ]
        lib.tpuslam_free.restype = None
        lib.tpuslam_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _call(fn_name: str, path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = getattr(lib, fn_name)(path.encode(), ctypes.byref(out))
    if n <= 0 or not out:
        return np.zeros((0, 3), dtype=np.float32)
    try:
        arr = np.ctypeslib.as_array(out, shape=(n, 3)).copy()
    finally:
        lib.tpuslam_free(out)
    return arr


def load_obj(path: str) -> np.ndarray:
    return _call("tpuslam_load_obj", path)


def load_off(path: str) -> np.ndarray:
    return _call("tpuslam_load_off", path)


def _write(fn_name: str, path: str, points: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        raise RuntimeError("native writer unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    buf = pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    return bool(
        getattr(lib, fn_name)(path.encode(), buf, len(pts))
    )


def write_obj(path: str, points: np.ndarray) -> bool:
    return _write("tpuslam_write_obj", path, points)


def write_off(path: str, points: np.ndarray) -> bool:
    return _write("tpuslam_write_off", path, points)
