"""Chunked slide prediction: run a fine-tuned HookNet over slide tiles and
return the predicted class-index masks.

The reference pipeline never materializes predictions for the user — its
validation loop argmaxes the logits and immediately reduces them to
confusion statistics (``/root/reference/tools/evaluate.py:283-310``).
Exporting the masks themselves (per tile, and stitched back into
slide-level maps with the prep grid geometry) is the missing last mile for
actually *using* a fine-tuned model; this module adds it on the same
chunked, transfer-minimal datapath as validation (`train/evaluate.py`).

Heads:
  * ``"target"`` — argmax of the target-branch logits: the seg_size (256)
    center crop of each tile at full resolution (the map the reference
    scores, ``evaluate.py:284``);
  * ``"context"`` — argmax of the context-branch logits: the whole tile at
    seg_size resolution (1/4 scale for 1024px tiles; dense coverage, so
    stitched slide maps have no gaps).

Transfer notes (axon tunnel, CLAUDE.md): predictions leave the device as
uint8 (classes < 256) with ``copy_to_host_async`` issued right after each
chunk's dispatch, and the blocking ``device_get`` happens once per slide —
naive per-chunk ``np.asarray`` fetches are pathologically slow there.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import TileGrid
from .evaluate import _pad_to_multiple

__all__ = [
    "make_chunk_preds_hostviews",
    "make_chunk_preds_u8",
    "make_chunk_preds_for_views",
    "predict_slide",
    "stitch_context_preds",
    "stitch_target_preds",
]

HEADS = ("context", "target")


def _argmax_u8(logits):
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.uint8)


def _shard(fn, mesh, n_in_data: int, n_out: int):
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(repl,) + (data,) * n_in_data,
        out_shardings=(data,) * n_out,
    )


def make_chunk_preds_hostviews(model, cfg=None, mesh=None, heads=("target",)):
    """Jitted predictions over one chunk of HOST-PREBUILT uint8 eval views
    (``data.pipeline.make_seg_val_views_host``): ``(variables, ctx_u8,
    tgt_u8) -> tuple[(chunk, s, s) uint8 per head]``. Only ``/255`` +
    Normalize run on device — the reference's literal CPU/device split
    (``/root/reference/tools/evaluate.py:151-178``)."""
    from ..data.pipeline import AugConfig, _to_float
    from ..ops import augment as A

    cfg = cfg or AugConfig()
    heads = _check_heads(heads)

    def preds_impl(variables, ctx_u8, tgt_u8):
        ctx = A.normalize(_to_float(ctx_u8, cfg.dtype), cfg.mean, cfg.std)
        tgt = A.normalize(_to_float(tgt_u8, cfg.dtype), cfg.mean, cfg.std)
        ctx_logits, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        by_head = {"context": ctx_logits, "target": tgt_logits}
        return tuple(_argmax_u8(by_head[h]) for h in heads)

    return _shard(preds_impl, mesh, n_in_data=2, n_out=len(heads))


def make_chunk_preds_u8(model, cfg=None, mesh=None, heads=("target",)):
    """Like :func:`make_chunk_preds_hostviews`, but the input is one chunk
    of RAW uint8 slide tiles ``(chunk, tile, tile, 3)``: the deterministic
    eval views (Resize/CenterCrop + Normalize) are built ON DEVICE inside
    the same jit as the forward — for direct-attached hosts
    (``--val-views device``)."""
    from ..data.pipeline import AugConfig, make_seg_val_views

    cfg = cfg or AugConfig()
    heads = _check_heads(heads)

    def preds_impl(variables, imgs_u8):
        zeros = jnp.zeros(imgs_u8.shape[:3], jnp.int32)  # no masks at predict time
        (ctx, tgt), _ = make_seg_val_views(imgs_u8, zeros, cfg)
        ctx_logits, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        by_head = {"context": ctx_logits, "target": tgt_logits}
        return tuple(_argmax_u8(by_head[h]) for h in heads)

    return _shard(preds_impl, mesh, n_in_data=1, n_out=len(heads))


def make_chunk_preds_for_views(model, val_views: str, cfg=None, mesh=None, heads=("target",)):
    """The prediction function for a CLI ``--val-views`` mode: "host"
    expects host-prebuilt uint8 views, "device" raw uint8 tiles."""
    if val_views == "host":
        return make_chunk_preds_hostviews(model, cfg=cfg, mesh=mesh, heads=heads)
    return make_chunk_preds_u8(model, cfg=cfg, mesh=mesh, heads=heads)


def _check_heads(heads):
    heads = tuple(heads)
    bad = [h for h in heads if h not in HEADS]
    if bad or not heads:
        raise ValueError(f"heads must be a non-empty subset of {HEADS}, got {heads!r}")
    return heads


def predict_slide(
    preds_fn: Callable,
    variables,
    arrays: tuple,
    chunk: int = 128,
    sharding=None,
) -> tuple[np.ndarray, ...]:
    """Run one slide's tiles through a ``make_chunk_preds_*`` function.

    ``arrays`` are the per-tile input arrays (``(ctx_u8, tgt_u8)`` for host
    views, ``(imgs_u8,)`` for raw tiles); they are padded to a chunk
    multiple, uploaded double-buffered, and the uint8 predictions come back
    with one blocking fetch per slide. Returns one (T, s, s) uint8 array
    per head, trimmed to the real tile count.
    """
    from concurrent.futures import ThreadPoolExecutor

    n = int(arrays[0].shape[0])
    arrays = tuple(_pad_to_multiple(np.ascontiguousarray(a), chunk)[0] for a in arrays)
    total = arrays[0].shape[0]

    def put(lo):
        hi = lo + chunk
        if sharding is not None:
            return tuple(jax.device_put(a[lo:hi], sharding) for a in arrays)
        return tuple(jax.device_put(a[lo:hi]) for a in arrays)

    chunks: list[tuple] = []
    with ThreadPoolExecutor(1) as pool:
        fut = pool.submit(put, 0)
        for i in range(0, total, chunk):
            chunk_args = fut.result()
            if i + chunk < total:
                fut = pool.submit(put, i + chunk)
            out = preds_fn(variables, *chunk_args)
            for a in out:  # start the D2H while later chunks compute
                a.copy_to_host_async()
            chunks.append(out)
    preds = tuple(
        np.concatenate([jax.device_get(c[h]) for c in chunks], axis=0)[:n]
        for h in range(len(chunks[0]))
    )
    return preds


def stitch_context_preds(
    preds: np.ndarray, indices, grid: TileGrid, seg_size: int = 256
) -> np.ndarray:
    """Assemble per-tile CONTEXT predictions (whole tile at seg_size
    resolution) into one slide-level map at ``seg_size/tile_size`` scale.

    ``indices`` are the prep-time tile ids (the ``<idx>.png`` basenames
    written by ``data/prepare.py``), which address ``grid`` row-major.
    Tiles the prep step dropped (all-background) stay class 0. The canvas
    is cropped to the scaled slide extent (the grid's last row/column are
    zero-padded past the slide boundary).
    """
    canvas = np.zeros((grid.num_h * seg_size, grid.num_w * seg_size), np.uint8)
    for p, idx in zip(preds, indices):
        i_h, i_w = divmod(int(idx), grid.num_w)
        canvas[
            i_h * seg_size : (i_h + 1) * seg_size,
            i_w * seg_size : (i_w + 1) * seg_size,
        ] = p
    sh = -(-grid.height * seg_size // grid.tile_size)  # ceil scale
    sw = -(-grid.width * seg_size // grid.tile_size)
    return canvas[:sh, :sw]


def stitch_target_preds(
    preds: np.ndarray, indices, grid: TileGrid, seg_size: int = 256
) -> np.ndarray:
    """Assemble per-tile TARGET predictions (full-resolution seg_size center
    crops) into a full-resolution slide canvas. Regions outside the center
    crops (and dropped tiles) stay class 0 — the target head only sees the
    center ``seg_size`` of each tile, so coverage has a regular border gap
    unless the prep used ``--overlap tile_size - seg_size`` or denser.
    """
    canvas = np.zeros((grid.height, grid.width), np.uint8)
    off = (grid.tile_size - seg_size) // 2
    for p, idx in zip(preds, indices):
        y, x = grid.origin(int(idx))
        y, x = y + off, x + off
        y1, x1 = min(y + seg_size, grid.height), min(x + seg_size, grid.width)
        if y1 <= y or x1 <= x:
            continue  # crop lies entirely in the padded margin
        canvas[y:y1, x:x1] = p[: y1 - y, : x1 - x]
    return canvas
