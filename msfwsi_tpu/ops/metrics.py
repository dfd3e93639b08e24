"""Segmentation quality metrics, bit-compatible with the smp semantics the
reference relies on (``segmentation_models_pytorch.metrics``; usage at
``tools/evaluate.py:283-310``, ``tools/ssl_finetune.py:319,440-447``).

The reference pipeline shifts labels down by one and ignores ``-1`` so that
background (class 0) is excluded: ``get_stats(pred-1, mask-1,
mode=multiclass, ignore_index=-1, num_classes=C)``.

Implemented fully vectorized (no per-sample Python loop, unlike smp's
``torch.histc`` loop) and jit-friendly; the arithmetic is exact integer
counting so results match smp bit-for-bit, including:
  * ignored pixels excluded from tp/fp/fn and subtracted from tn;
  * predictions outside ``[0, num_classes)`` counting as neither tp nor fp
    (smp's histc drops out-of-range bins) but still as fn for the target;
  * zero-division -> 0 (smp's default ``zero_division="warn"`` replaces the
    resulting NaNs with 0).

Reductions supported (the three the reference uses): ``"micro"``,
``"micro-imagewise"``, ``None``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "get_stats",
    "f1_score",
    "iou_score",
    "accuracy",
    "fbeta_score",
]


def get_stats(output, target, num_classes: int, ignore_index: int | None = None):
    """Per-image, per-class confusion counts.

    Args:
      output: (N, ...) integer predicted class maps.
      target: (N, ...) integer ground-truth class maps.
      num_classes: number of classes C (class ids counted are 0..C-1).
      ignore_index: target value to exclude entirely (commonly -1).

    Returns:
      (tp, fp, fn, tn) each of shape (N, C), int32.
    """
    n = output.shape[0]
    output = output.reshape(n, -1)
    target = target.reshape(n, -1)
    num_elements = output.shape[1]

    if ignore_index is not None:
        ignored = target == ignore_index
        # smp masks *both* tensors to ignore_index so ignored pixels fall out
        # of every class bin.
        output = jnp.where(ignored, ignore_index, output)
        ignored_per_sample = ignored.sum(axis=1).astype(jnp.int32)
    else:
        ignored_per_sample = jnp.zeros((n,), jnp.int32)

    classes = jnp.arange(num_classes)
    out_onehot = output[:, :, None] == classes  # (N, P, C)
    tgt_onehot = target[:, :, None] == classes

    tp = jnp.sum(out_onehot & tgt_onehot, axis=1).astype(jnp.int32)
    fp = jnp.sum(out_onehot, axis=1).astype(jnp.int32) - tp
    fn = jnp.sum(tgt_onehot, axis=1).astype(jnp.int32) - tp
    tn = num_elements - ignored_per_sample[:, None] - tp - fp - fn
    return tp, fp, fn, tn


def _zero_div(x):
    """smp zero_division='warn' behavior: NaN -> 0 (without the warning)."""
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def _reduce(metric_fn, tp, fp, fn, tn, reduction):
    # Sum the confusion counts in their integer dtype FIRST (smp sums int64
    # tensors and only then divides); a float32 cast before summation would
    # round counts above 2^24 (e.g. tn on slides of >=257 256px tiles) and
    # break the documented count-level parity. Only the final ratio is
    # computed in float.
    tp = jnp.asarray(tp)
    fp = jnp.asarray(fp)
    fn = jnp.asarray(fn)
    tn = jnp.asarray(tn)

    def score(*counts):
        return metric_fn(*(jnp.asarray(c, jnp.float32) for c in counts))

    if reduction == "micro":
        return _zero_div(score(tp.sum(), fp.sum(), fn.sum(), tn.sum()))
    if reduction == "micro-imagewise":
        # Sum over classes per image, score per image, then mean over images.
        s = score(tp.sum(-1), fp.sum(-1), fn.sum(-1), tn.sum(-1))
        return _zero_div(s).mean()
    if reduction == "macro":
        s = score(tp.sum(0), fp.sum(0), fn.sum(0), tn.sum(0))
        return _zero_div(s).mean()
    if reduction == "macro-imagewise":
        s = _zero_div(score(tp, fp, fn, tn)).mean(0)
        return s.mean()
    if reduction is None or reduction == "none":
        return _zero_div(score(tp, fp, fn, tn))
    raise ValueError(f"unsupported reduction {reduction!r}")


def fbeta_score(tp, fp, fn, tn, beta: float = 1.0, reduction=None):
    b2 = beta**2

    def fn_(tp, fp, fn, tn):
        return ((1 + b2) * tp) / ((1 + b2) * tp + b2 * fn + fp)

    return _reduce(fn_, tp, fp, fn, tn, reduction)


def f1_score(tp, fp, fn, tn, reduction=None):
    return fbeta_score(tp, fp, fn, tn, beta=1.0, reduction=reduction)


def iou_score(tp, fp, fn, tn, reduction=None):
    return _reduce(lambda tp, fp, fn, tn: tp / (tp + fp + fn), tp, fp, fn, tn, reduction)


def accuracy(tp, fp, fn, tn, reduction=None):
    return _reduce(
        lambda tp, fp, fn, tn: (tp + tn) / (tp + fp + fn + tn), tp, fp, fn, tn, reduction
    )
