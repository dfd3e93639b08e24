"""ctypes bindings for the native tile-decoding library (C++ / libpng /
libjpeg; ``tileio.cpp``).

Auto-builds ``libtileio.so`` with the system toolchain on first use and
falls back gracefully (callers check :func:`available`). This is the
native-runtime piece of the host data path — the reference gets the
equivalent from torch DataLoader worker processes + PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "decode_batch", "probe", "load_library"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtileio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["sh", os.path.join(_DIR, "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
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
        lib.tileio_decode_batch.restype = ctypes.c_int
        lib.tileio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tileio_probe.restype = ctypes.c_int
        lib.tileio_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def probe(path: str):
    """(height, width, stored_channels) of an image file."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("tileio library unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.tileio_probe(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"tileio_probe({path}) failed with code {rc}")
    return h.value, w.value, c.value


def decode_batch(paths, height: int, width: int, channels: int, n_threads: int = 0):
    """Decode ``len(paths)`` same-shape images into one contiguous
    (N, H, W, C) uint8 array (C=1 returns (N, H, W)). Raises on any file
    failing (callers fall back to the PIL path)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("tileio library unavailable")
    n = len(paths)
    out = np.empty((n, height, width, channels), np.uint8)
    status = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.tileio_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height,
        width,
        channels,
        n_threads,
        status,
    )
    if rc != 0:
        bad = [paths[i] for i in range(n) if status[i] != 0][:3]
        raise IOError(f"tileio_decode_batch failed (code {rc}) on e.g. {bad}")
    return out[..., 0] if channels == 1 else out
