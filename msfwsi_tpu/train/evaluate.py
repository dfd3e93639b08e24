"""Per-slide tiled validation — parity with ``tools/evaluate.py:240-326`` /
``ssl_finetune.py:477-563``.

Semantics reproduced exactly:
  * one "batch" == one slide == all its tiles;
  * tiles run through HookNet in chunks of 128 (``evaluate.py:270-281``);
  * predicted mask = argmax of the *target* logits;
  * stats: ``get_stats(pred-1, mask-1, multiclass, ignore_index=-1)`` so
    background 0 is ignored (``evaluate.py:284-291``);
  * micro F1/IoU/accuracy per slide, means over slides
    (``evaluate.py:293-298,319-326``);
  * per-class: sum tp/fp/fn/tn over the slide's tiles, then reduction=None
    scores, appended per slide (``evaluate.py:300-310``).

XLA-friendly chunking: slides have variable tile counts, so tiles are padded
to a multiple of ``chunk`` (padded predictions are dropped before scoring) —
every chunk has the same static shape and one compile covers every slide.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import accuracy, f1_score, get_stats, iou_score

__all__ = [
    "make_chunk_forward",
    "make_chunk_stats",
    "make_chunk_stats_u8",
    "make_chunk_stats_hostviews",
    "make_chunk_stats_for_views",
    "validate_slides",
    "validate_slide",
    "validate_slide_u8",
    "validate_slide_hostviews",
    "validate",
    "SlideScores",
]


def make_chunk_forward(model, chunk: int = 128, mesh=None):
    """Jitted forward over one fixed-size chunk of (context, target) tiles,
    returning the predicted target mask (chunk, H, W) int32.

    With a ``mesh``, the chunk's tile axis is sharded over "data" so slide
    inference runs across all chips — the reference instead validates on
    rank 0 while the other GPUs idle (``ssl_finetune.py:308``).
    """

    def forward_impl(variables, ctx, tgt):
        _, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        return jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)

    if mesh is None:
        return jax.jit(forward_impl)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        forward_impl, in_shardings=(repl, data, data), out_shardings=data
    )


def make_chunk_stats(model, num_classes: int, chunk: int = 128, mesh=None):
    """Jitted forward + confusion-stat accumulation over one chunk.

    Returns a function ``(variables, ctx, tgt, masks, acc) -> acc`` where
    ``acc`` is a stacked (4, num_classes) int32 array of running
    tp/fp/fn/tn sums. Predictions never leave the device — only the final
    tiny accumulator is fetched per slide. (The previous design pulled the
    full (chunk, H, W) prediction maps to the host every chunk; through the
    axon tunnel a big-array fetch is pathologically slow, and on any
    hardware it wastes PCIe/ICI bandwidth — ``/root/reference``'s
    ``evaluate.py:270-291`` has the same host round-trip via ``.cpu()``.)

    Padded tiles (zero masks) contribute nothing: every pixel of a padded
    tile has target-1 == -1 == ignore_index, so its tp/fp/fn/tn rows are
    exactly zero — the smp ignore semantics double as the padding mask.
    """

    def stats_impl(variables, ctx, tgt, masks, acc):
        _, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        pred = jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        tp, fp, fn, tn = get_stats(
            pred - 1,
            masks.astype(jnp.int32) - 1,
            num_classes=num_classes,
            ignore_index=-1,
        )
        new = jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)])
        return acc + new

    if mesh is None:
        return jax.jit(stats_impl)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        stats_impl,
        in_shardings=(repl, data, data, data, repl),
        out_shardings=repl,
    )


def make_chunk_stats_u8(model, num_classes: int, cfg=None, mesh=None):
    """Like :func:`make_chunk_stats`, but the input is one chunk of RAW
    uint8 slide tiles ``(chunk, tile, tile, 3)`` + uint8 masks: the
    deterministic eval views (Resize/CenterCrop + Normalize,
    ``make_seg_val_views``) are built ON DEVICE inside the same jit as the
    forward + stat accumulation.

    This is the device-resident replacement for the CLI loop that built
    views eagerly, pulled them to the host, and re-uploaded them per chunk
    (reference does the same via CPU dataloaders + ``.cpu()`` fetches,
    ``/root/reference/tools/evaluate.py:151-178,270-291``). Measured on the
    axon v5e tunnel (``tools/diag/eval_datapath_bench.py``, 96-tile slide):
    the old path spends ~58 s building views eagerly plus ~7 s of D2H/H2D
    round trips at ~20 MB/s; uint8 chunk uploads ride the loader-style H2D
    path at ~1.6 GB/s and everything else stays on device.

    Padded tiles must be all-zero: a zero mask means every pixel has
    ``target-1 == -1 == ignore_index``, so they contribute nothing.
    """
    from ..data.pipeline import AugConfig, make_seg_val_views

    cfg = cfg or AugConfig()

    def stats_impl(variables, imgs_u8, masks_u8, acc):
        (ctx, tgt), (_, tmask) = make_seg_val_views(imgs_u8, masks_u8, cfg)
        _, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        pred = jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        tp, fp, fn, tn = get_stats(
            pred - 1, tmask - 1, num_classes=num_classes, ignore_index=-1
        )
        new = jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)])
        return acc + new

    if mesh is None:
        return jax.jit(stats_impl)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        stats_impl,
        in_shardings=(repl, data, data, repl),
        out_shardings=repl,
    )


def make_chunk_stats_hostviews(model, num_classes: int, cfg=None, mesh=None):
    """Stats over one chunk of HOST-PREBUILT uint8 eval views
    (:func:`data.pipeline.make_seg_val_views_host`): inputs are
    ``(ctx_u8, tgt_u8, tmask)`` at ``seg_size`` — only ``/255`` +
    Normalize happen on device, inside the same jit as the forward.

    This is the reference's literal split of work (uint8 cv2 resize/crop on
    CPU, normalize + forward on the accelerator) and the smallest-possible
    H2D payload (~0.45 MB/tile vs 4.2 MB for raw 1024px tiles) — the
    preferred path through the ~50 MB/s axon tunnel.
    """
    from ..data.pipeline import AugConfig, _to_float
    from ..ops import augment as A

    cfg = cfg or AugConfig()

    def stats_impl(variables, ctx_u8, tgt_u8, tmask, acc):
        ctx = A.normalize(_to_float(ctx_u8, cfg.dtype), cfg.mean, cfg.std)
        tgt = A.normalize(_to_float(tgt_u8, cfg.dtype), cfg.mean, cfg.std)
        _, tgt_logits = model.apply(variables, ctx, tgt, train=False)
        pred = jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        tp, fp, fn, tn = get_stats(
            pred - 1,
            tmask.astype(jnp.int32) - 1,
            num_classes=num_classes,
            ignore_index=-1,
        )
        new = jnp.stack([tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0)])
        return acc + new

    if mesh is None:
        return jax.jit(stats_impl)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        stats_impl,
        in_shardings=(repl, data, data, data, repl),
        out_shardings=repl,
    )


def _run_chunked_stats(
    stats_fn: Callable,
    variables,
    arrays: tuple,
    num_classes: int,
    chunk: int,
    sharding=None,
):
    """Shared chunk driver: pad each array to a chunk multiple, device_put
    chunk i+1 on a background thread (double-buffered, the
    ``TileBatchLoader`` H2D pattern) while chunk i's stats dispatch; the
    accumulator stays on device and the single host fetch is the final
    (4, C) sums."""
    from concurrent.futures import ThreadPoolExecutor

    arrays = tuple(_pad_to_multiple(np.ascontiguousarray(a), chunk)[0] for a in arrays)
    n = arrays[0].shape[0]

    def put(lo):
        hi = lo + chunk
        if sharding is not None:
            return tuple(jax.device_put(a[lo:hi], sharding) for a in arrays)
        return tuple(jax.device_put(a[lo:hi]) for a in arrays)

    acc = jnp.zeros((4, num_classes), jnp.int32)
    with ThreadPoolExecutor(1) as pool:
        fut = pool.submit(put, 0)
        for i in range(0, n, chunk):
            chunk_args = fut.result()
            if i + chunk < n:
                fut = pool.submit(put, i + chunk)
            acc = stats_fn(variables, *chunk_args, acc)
    sums = np.asarray(acc)  # (4, C) — the only device->host fetch
    tp, fp, fn, tn = (jnp.asarray(s) for s in sums)
    micro = {
        "f1": float(f1_score(tp, fp, fn, tn, reduction="micro")),
        "iou": float(iou_score(tp, fp, fn, tn, reduction="micro")),
        "acc": float(accuracy(tp, fp, fn, tn, reduction="micro")),
    }
    return micro, tuple(sums)


def validate_slide_u8(
    stats_fn: Callable,
    variables,
    imgs_u8: np.ndarray,
    masks_u8: np.ndarray,
    num_classes: int,
    chunk: int = 128,
    sharding=None,
):
    """Evaluate one slide from raw uint8 tiles with a
    :func:`make_chunk_stats_u8` function (views built on device).

    ``sharding`` should be the chunk-axis ``NamedSharding(mesh, P("data"))``
    when ``stats_fn`` was built with a mesh, so uploads land pre-sharded.
    """
    return _run_chunked_stats(
        stats_fn, variables, (imgs_u8, masks_u8), num_classes, chunk, sharding
    )


def validate_slide_hostviews(
    stats_fn: Callable,
    variables,
    ctx_u8: np.ndarray,
    tgt_u8: np.ndarray,
    tmask: np.ndarray,
    num_classes: int,
    chunk: int = 128,
    sharding=None,
):
    """Evaluate one slide from host-prebuilt uint8 views
    (:func:`data.pipeline.make_seg_val_views_host`) with a
    :func:`make_chunk_stats_hostviews` function."""
    return _run_chunked_stats(
        stats_fn, variables, (ctx_u8, tgt_u8, tmask), num_classes, chunk, sharding
    )


def make_chunk_stats_for_views(model, num_classes: int, val_views: str, cfg=None, mesh=None):
    """The stat function for a CLI ``--val-views`` mode: "host" expects
    host-prebuilt uint8 views, "device" raw uint8 tiles (views built inside
    the chunk jit)."""
    if val_views == "host":
        return make_chunk_stats_hostviews(model, num_classes, cfg=cfg, mesh=mesh)
    return make_chunk_stats_u8(model, num_classes, cfg=cfg, mesh=mesh)


def validate_slides(
    stats_fn: Callable,
    variables,
    slides,
    val_views: str,
    class_names,
    chunk: int = 128,
    sharding=None,
    on_slide: Callable | None = None,
):
    """Shared CLI per-slide validation loop (``ssl_finetune`` and
    ``evaluate`` drive the same datapath): ``slides`` yields
    ``(ctx_u8, tgt_u8, tmask)`` in "host" mode or ``(imgs_u8, masks_u8)``
    in "device" mode; the next slide's decode / host view build prefetches
    under the current slide's device pass (cv2/PNG work releases the GIL).
    ``on_slide(i, micro)`` is an optional per-slide progress hook. Returns
    the populated :class:`SlideScores`."""
    from ..utils import prefetch_iter

    validate_one = (
        validate_slide_hostviews if val_views == "host" else validate_slide_u8
    )
    scores = SlideScores(class_names)
    for i, item in enumerate(prefetch_iter(slides)):
        micro, sums = validate_one(
            stats_fn,
            variables,
            *item,
            num_classes=len(class_names),
            chunk=chunk,
            sharding=sharding,
        )
        scores.update(micro, sums)
        if on_slide is not None:
            on_slide(i, micro)
    return scores


def _pad_to_multiple(arr: np.ndarray, chunk: int):
    n = arr.shape[0]
    pad = (-n) % chunk
    if pad:
        arr = np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], axis=0)
    return arr, n


def validate_slide(
    stats_fn: Callable,
    variables,
    context_tiles: np.ndarray,
    target_tiles: np.ndarray,
    target_masks: np.ndarray,
    num_classes: int,
    chunk: int = 128,
):
    """Evaluate one slide; returns (micro dict, per-class tp/fp/fn/tn sums).

    ``stats_fn`` is a :func:`make_chunk_stats` function. Chunks are
    dispatched back-to-back with the accumulator staying on device; the
    single host fetch happens at the end of the slide.
    """
    ctx, _ = _pad_to_multiple(np.asarray(context_tiles), chunk)
    tgt, _ = _pad_to_multiple(np.asarray(target_tiles), chunk)
    masks, _ = _pad_to_multiple(np.asarray(target_masks).astype(np.int32), chunk)

    acc = jnp.zeros((4, num_classes), jnp.int32)
    for i in range(0, ctx.shape[0], chunk):
        acc = stats_fn(
            variables,
            ctx[i : i + chunk],
            tgt[i : i + chunk],
            masks[i : i + chunk],
            acc,
        )
    sums = np.asarray(acc)  # (4, C) — the only device->host fetch
    tp, fp, fn, tn = (jnp.asarray(s) for s in sums)
    micro = {
        "f1": float(f1_score(tp, fp, fn, tn, reduction="micro")),
        "iou": float(iou_score(tp, fp, fn, tn, reduction="micro")),
        "acc": float(accuracy(tp, fp, fn, tn, reduction="micro")),
    }
    return micro, tuple(sums)


class SlideScores:
    """Accumulates the reference's validation aggregates
    (``evaluate.py:251-256,319-326``)."""

    def __init__(self, class_names):
        self.class_names = list(class_names)
        self.micro = {"f1": [], "iou": [], "acc": []}
        self.per_class = {
            m: {c: [] for c in self.class_names} for m in ("f1", "iou", "acc")
        }

    def update(self, micro: dict, sums):
        for k, v in micro.items():
            self.micro[k].append(v)
        tp, fp, fn, tn = (jnp.asarray(x) for x in sums)
        raw = {
            "f1": f1_score(tp, fp, fn, tn, reduction=None),
            "iou": iou_score(tp, fp, fn, tn, reduction=None),
            "acc": accuracy(tp, fp, fn, tn, reduction=None),
        }
        for m, scores in raw.items():
            for idx, cls in enumerate(self.class_names):
                self.per_class[m][cls].append(float(scores[idx]))

    def summary(self):
        out = {f"{k}_micro": float(np.mean(v)) for k, v in self.micro.items()}
        for m in ("f1", "iou", "acc"):
            for cls in self.class_names:
                out[f"{m}_{cls}"] = float(np.mean(self.per_class[m][cls]))
        return out


def validate(
    model,
    variables,
    slides: Iterable,
    class_names,
    chunk: int = 128,
    stats_fn=None,
):
    """Full validation pass over an iterable of slides, each
    ``(context_tiles, target_tiles, target_masks)`` uint8/float arrays.

    ``stats_fn`` must be a :func:`make_chunk_stats` result (signature
    ``(variables, ctx, tgt, masks, acc) -> acc``) — NOT a
    :func:`make_chunk_forward` function, which has a different contract.
    Defaults to building one from ``model``.

    Returns the summary dict: micro means over slides + per-class means —
    the numbers the reference logs at ``evaluate.py:226-237``.
    """
    scores = SlideScores(class_names)
    num_classes = len(list(class_names))
    stats_fn = stats_fn or make_chunk_stats(model, num_classes, chunk)
    for ctx, tgt, masks in slides:
        micro, sums = validate_slide(
            stats_fn, variables, ctx, tgt, masks, num_classes=num_classes, chunk=chunk
        )
        scores.update(micro, sums)
    return scores.summary()
