"""Packed tile cache: decode once, stream raw bytes forever.

At TPU speeds the host-side PNG decode becomes the pipeline bottleneck
(~30-150 source tiles/s decoded vs ~170 consumed per chip): 500 epochs of
SSL pretraining re-decode every tile 500 times. The packed cache trades
disk for decode: tiles are decoded once into an uncompressed uint8 memmap
``(N, H, W, C)`` + a JSON index, and the loader then serves batches at
page-cache/disk bandwidth (milliseconds per batch, no CPU).

This is the TPU-first evolution of the reference's
``Camelyon16PretrainDatasetFast`` idea (``camelyon.py:86-140``: skip
transforms, return raw tensors) — here the decode itself is also hoisted
out of the training loop.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Sequence

import numpy as np

__all__ = ["pack_key", "build_pack", "PackedTiles", "get_or_build_pack"]


def pack_key(files: Sequence[str], root: str = "") -> str:
    """Stable key for (dataset root, ordered file list).

    The root is part of the key: two dataset roots whose RELATIVE tile
    names coincide (e.g. a re-prepared dataset) must not share a pack, or
    the second run silently trains on the first run's pixels. Order is
    part of the key too — an order-insensitive key with the exact-order
    validation in get_or_build_pack made two stable orderings of the same
    set ping-pong full rebuilds over one prefix (clobbering a pack another
    live process may have mmapped)."""
    h = hashlib.sha256()
    h.update(os.path.realpath(root).encode() if root else b"")
    h.update(b"\0")
    for f in files:
        h.update(f.encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


def build_pack(root: str, files: Sequence[str], out_prefix: str, batch: int = 64) -> str:
    """Decode ``files`` (relative to ``root``) into ``<out_prefix>.npy`` +
    ``<out_prefix>.json``. Returns the prefix. Uses the native decoder when
    available."""
    from . import loader as L
    from .. import native

    assert files, "cannot pack an empty file list"
    first = L.load_image(os.path.join(root, files[0]))
    shape = first.shape
    n = len(files)

    arr = np.lib.format.open_memmap(
        out_prefix + ".npy", mode="w+", dtype=np.uint8, shape=(n, *shape)
    )
    use_native = native.available() and first.ndim == 3 and shape[-1] in (1, 3)
    for i0 in range(0, n, batch):
        chunk = files[i0 : i0 + batch]
        if use_native:
            try:
                arr[i0 : i0 + len(chunk)] = native.decode_batch(
                    [os.path.join(root, f) for f in chunk], shape[0], shape[1], shape[2]
                )
                continue
            except Exception:
                use_native = False
        for j, f in enumerate(chunk):
            arr[i0 + j] = L.load_image(os.path.join(root, f))
    arr.flush()

    with open(out_prefix + ".json", "w") as fh:
        json.dump(
            {"files": list(files), "shape": list(shape), "key": pack_key(files, root)}, fh
        )
    return out_prefix


class PackedTiles:
    """Reader over a built pack; index by original file path or position."""

    def __init__(self, prefix: str):
        self.arr = np.load(prefix + ".npy", mmap_mode="r")
        with open(prefix + ".json") as fh:
            meta = json.load(fh)
        self.files = meta["files"]
        self.key = meta["key"]
        self._pos = {f: i for i, f in enumerate(self.files)}

    def __len__(self):
        return len(self.files)

    def load(self, rec) -> np.ndarray:
        idx = rec if isinstance(rec, (int, np.integer)) else self._pos[rec]
        return np.asarray(self.arr[idx])  # copy out of the memmap


def get_or_build_pack(root: str, files: Sequence[str], cache_dir: str) -> PackedTiles:
    """Return a pack for ``files``, building it under ``cache_dir`` on first
    use (cache key = content hash of the file list)."""
    os.makedirs(cache_dir, exist_ok=True)
    prefix = os.path.join(cache_dir, f"pack_{pack_key(files, root)}")
    if not (os.path.exists(prefix + ".npy") and os.path.exists(prefix + ".json")):
        build_pack(root, files, prefix)
    pack = PackedTiles(prefix)
    if pack.files != list(files):
        # hash collision (the key covers root + order, so this is rare)
        build_pack(root, files, prefix)
        pack = PackedTiles(prefix)
    return pack
