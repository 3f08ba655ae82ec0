"""ctypes bindings for the native C++ host loader (decoder.cpp).

Provides multi-threaded decode+preprocess batches that are bit-identical to
the PIL/NumPy path (gan_tpu.data.pipeline) — the C++ replacement for the
tf.data C++ runtime the reference leaned on (SURVEY §2.9). The library is
built lazily with ``make`` on first use; ``available()`` gates callers so
everything degrades gracefully to the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgtloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gt_load_pair_batch.restype = ctypes.c_int
        lib.gt_load_pair_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        lib.gt_load_single_batch.restype = ctypes.c_int
        lib.gt_load_single_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _n_threads(n_files: int) -> int:
    return max(1, min(os.cpu_count() or 8, n_files))


def load_pair_batch(paths, *, channels: int, orient: str, size: int) -> np.ndarray:
    """(N, 2, size, size, C) uint8 — native twin of
    pipeline.build_pix2pix_cache's per-file work."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    out = np.empty((len(paths), 2, size, size, channels), np.uint8)
    rc = lib.gt_load_pair_batch(
        _paths_array(paths), len(paths), channels, 1 if orient == "left" else 0,
        size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _n_threads(len(paths)))
    if rc:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out


def load_single_batch(paths, *, channels: int, img_size: int, out_size: int) -> np.ndarray:
    """(N, out_size, out_size, C) uint8 — native twin of
    pipeline.build_cyclegan_cache's per-file work."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    out = np.empty((len(paths), out_size, out_size, channels), np.uint8)
    rc = lib.gt_load_single_batch(
        _paths_array(paths), len(paths), channels, img_size, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _n_threads(len(paths)))
    if rc:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out
