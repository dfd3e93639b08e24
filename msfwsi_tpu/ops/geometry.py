"""Exact tiling / jigsaw geometry contracts of MSF-WSI, as pure functions.

These are the unit-testable invariants the rest of the framework builds on
(reference semantics: ``src/utils/data/bcss.py:203-216`` blockshaped,
``bcss.py:171-177`` jigsaw shuffle + inverse, ``tools/bcss_prepare.py:36-69``
tile grid with shift and zero padding, ``bcss_prepare.py:25-34`` label remap).

Everything here is shape-static and works on both NumPy arrays (host data
prep) and JAX arrays (inside jit). Image layout is HWC / NHWC throughout.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "blockshaped",
    "unblockshaped",
    "batched_blockshaped",
    "invert_permutation",
    "gather_tiles",
    "unshuffle_features",
    "TileGrid",
    "BCSS_CLASS_REMAP",
    "remap_bcss_labels",
]


def blockshaped(arr, nrows: int, ncols: int):
    """Cut an (H, W, C) image into a row-major grid of (nrows, ncols) blocks.

    Returns (n, nrows, ncols, C) with n = (H//nrows) * (W//ncols); block i
    covers rows ``(i // (W//ncols)) * nrows`` onward — identical layout to the
    reference's ``blockshaped`` (``src/utils/data/bcss.py:203-216``).

    Works under jit (pure reshape/transpose, no data movement beyond a
    transpose XLA fuses away).
    """
    h, w, c = arr.shape
    if h % nrows != 0:
        raise ValueError(f"{h} rows is not evenly divisible by {nrows}")
    if w % ncols != 0:
        raise ValueError(f"{w} cols is not evenly divisible by {ncols}")
    return (
        arr.reshape(h // nrows, nrows, w // ncols, ncols, c)
        .swapaxes(1, 2)
        .reshape(-1, nrows, ncols, c)
    )


def unblockshaped(tiles, h: int, w: int):
    """Inverse of :func:`blockshaped`: (n, nrows, ncols, C) -> (h, w, C)."""
    n, nrows, ncols, c = tiles.shape
    if h % nrows != 0 or w % ncols != 0 or n * nrows * ncols != h * w:
        raise ValueError(f"cannot assemble {tiles.shape} into ({h}, {w}, {c})")
    return (
        tiles.reshape(h // nrows, w // ncols, nrows, ncols, c)
        .swapaxes(1, 2)
        .reshape(h, w, c)
    )


def batched_blockshaped(arr, nrows: int, ncols: int):
    """Batched variant: (B, H, W, C) -> (B, n, nrows, ncols, C)."""
    b, h, w, c = arr.shape
    if h % nrows != 0:
        raise ValueError(f"{h} rows is not evenly divisible by {nrows}")
    if w % ncols != 0:
        raise ValueError(f"{w} cols is not evenly divisible by {ncols}")
    return (
        arr.reshape(b, h // nrows, nrows, w // ncols, ncols, c)
        .swapaxes(2, 3)
        .reshape(b, -1, nrows, ncols, c)
    )


def invert_permutation(perm):
    """Inverse permutation via argsort — the reference's ``jigsaw_reverse_idx``
    (``src/utils/data/bcss.py:172``). Accepts (..., K) batched permutations."""
    return np.argsort(perm, axis=-1) if isinstance(perm, np.ndarray) else perm.argsort(axis=-1)


def gather_tiles(tiles, perm):
    """Reorder a (K, ...) tile stack (or batched (B, K, ...)) by ``perm``.

    ``gather_tiles(gather_tiles(x, perm), invert_permutation(perm)) == x``.
    """
    if perm.ndim == 1:
        return tiles[perm]
    # Batched: perm (B, K), tiles (B, K, ...) — per-sample gather.
    return np.take_along_axis(tiles, perm.reshape(perm.shape + (1,) * (tiles.ndim - 2)), axis=1) \
        if isinstance(tiles, np.ndarray) else _jax_batched_gather(tiles, perm)


def _jax_batched_gather(tiles, perm):
    import jax.numpy as jnp

    expand = perm.reshape(perm.shape + (1,) * (tiles.ndim - 2))
    return jnp.take_along_axis(tiles, expand, axis=1)


def unshuffle_features(feats, jigsaw_reverse_idx):
    """Restore spatial tile order of shuffled per-tile features.

    feats: (B, K, C) features of jigsaw-shuffled tiles; jigsaw_reverse_idx:
    (B, K) inverse permutations. Equivalent to the reference's batched gather
    ``i[batch_idx, jigsaw_idx, :]`` (``src/models/backbone.py:151-158``) —
    a sample-local gather, hence free of cross-device communication under
    batch sharding.
    """
    return gather_tiles(feats, jigsaw_reverse_idx)


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Grid geometry for cutting a (height, width) slide into fixed tiles.

    Reproduces ``tools/bcss_prepare.py:36-69``: tiles of ``tile_size`` start
    at ``(i_h * tile_size + shift_h, i_w * tile_size + shift_w)``; the slide
    is conceptually zero-padded on the bottom/right so every tile is full
    size; a shift drops the last row/column when the remainder cannot host it.
    """

    height: int
    width: int
    tile_size: int
    shift_h: int = 0
    shift_w: int = 0

    @property
    def num_h(self) -> int:
        # bcss_prepare.py:40-48 — pad_h always in [1, sz]; num_h = (h + pad_h) // sz
        n = (self.height + self.pad_h) // self.tile_size
        if self.height % self.tile_size < self.shift_h:
            n -= 1
        return n

    @property
    def num_w(self) -> int:
        n = (self.width + self.pad_w) // self.tile_size
        if self.width % self.tile_size < self.shift_w:
            n -= 1
        return n

    @property
    def pad_h(self) -> int:
        return self.tile_size - self.height % self.tile_size

    @property
    def pad_w(self) -> int:
        return self.tile_size - self.width % self.tile_size

    def __len__(self) -> int:
        return self.num_h * self.num_w

    def origin(self, idx: int) -> tuple[int, int]:
        """Top-left (y, x) of tile ``idx`` (row-major, may exceed the slide —
        the excess is zero padding)."""
        i_h, i_w = divmod(idx, self.num_w)
        return i_h * self.tile_size + self.shift_h, i_w * self.tile_size + self.shift_w

    def extract(self, img: np.ndarray, idx: int) -> np.ndarray:
        """Cut tile ``idx`` out of ``img`` ((H, W) or (H, W, C)), zero-padding
        past the slide boundary — exact ``bcss_prepare.py:54-69`` semantics."""
        y, x = self.origin(idx)
        sz = self.tile_size
        py0, py1 = max(0, y), min(y + sz, self.height)
        px0, px1 = max(0, x), min(x + sz, self.width)
        out_shape = (sz, sz) + img.shape[2:]
        patch = np.zeros(out_shape, img.dtype)
        patch[0 : py1 - py0, 0 : px1 - px0] = img[py0:py1, px0:px1]
        return patch


# BCSS ships 21 raw annotation codes; MSF-WSI collapses them to 5 classes
# (+0 background/outside) at prep time (``tools/bcss_prepare.py:25-34``).
BCSS_CLASS_REMAP = {
    1: (1, 19, 20),
    2: (2,),
    3: (3, 10, 11, 14),
    4: (4,),
    5: (5, 6, 7, 8, 9, 12, 13, 15, 16, 17, 18, 21),
}


def remap_bcss_labels(mask: np.ndarray) -> np.ndarray:
    """Collapse raw BCSS label codes to the 5-class scheme via a LUT — a
    single-gather vectorized equivalent of the reference's sequential
    ``np.isin`` sweeps (whose rules never rewrite each other's outputs, so
    the LUT reproduces them exactly).
    """
    # Size the LUT to the mask's actual range: a fixed 256-entry table would
    # IndexError on e.g. 16-bit PNG annotations with codes >= 256, where the
    # reference's isin sweeps (bcss_prepare.py:25-34) leave such codes
    # untouched.
    n = max(256, int(mask.max()) + 1 if mask.size else 256)
    lut = np.arange(n, dtype=mask.dtype)  # unmapped codes stay untouched
    for new, raws in BCSS_CLASS_REMAP.items():
        for r in raws:
            lut[r] = new
    return lut[mask]
