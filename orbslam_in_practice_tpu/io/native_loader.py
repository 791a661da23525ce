"""ctypes bindings for the native frame loader (native/frameio.cpp).

Builds libframeio.so on first use (g++ via make); callers fall back to the
Python loaders (io/datasets.py) when the toolchain or library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libframeio.so"))
_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=os.path.abspath(_NATIVE_DIR),
                    check=True,
                    capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fio_read_image.restype = ctypes.c_int
        lib.fio_read_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fio_open_queue.restype = ctypes.c_void_p
        lib.fio_open_queue.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fio_next.restype = ctypes.c_int
        lib.fio_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fio_close.restype = None
        lib.fio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_image(path: str, max_h: int = 4096, max_w: int = 4096) -> np.ndarray | None:
    """Decode one PGM/PPM to float32 grayscale [0, 255], or None on failure."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(max_h * max_w, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fio_read_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h),
        ctypes.byref(w),
        max_h,
        max_w,
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class PrefetchQueue:
    """Threaded read-ahead over an image sequence (native thread pool)."""

    def __init__(
        self,
        paths: list,
        prefetch: int = 8,
        n_threads: int = 2,
        max_h: int = 4096,
        max_w: int = 4096,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frameio unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._q = lib.fio_open_queue(arr, len(self._paths), prefetch, n_threads)
        self._max_h, self._max_w = max_h, max_w
        self._buf = np.empty(max_h * max_w, np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> tuple:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.fio_next(
            self._q,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(h),
            ctypes.byref(w),
            self._max_h,
            self._max_w,
        )
        if rc == -1:
            raise StopIteration
        if rc == -2:
            raise IOError("frame decode failed")
        img = self._buf[: h.value * w.value].reshape(h.value, w.value).copy()
        return rc, img

    def close(self):
        if self._q:
            self._lib.fio_close(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
