"""Loss functions: SimSiam negative cosine + multiclass soft Dice.

Numerics match the reference exactly:
  * ``simsiam_loss`` == ``-(cos(p1,z2).mean() + cos(p2,z1).mean())/2`` with
    torch ``nn.CosineSimilarity(dim=1)`` eps semantics
    (``tools/ssl_train.py:422,448-466,495-499``).
  * ``msfwsi_loss`` sums the three contrastive paths over 4 scales with the
    per-scale ``fuser_weights`` applied to all paths
    (``ssl_train.py:448-466``).
  * ``dice_loss`` == ``smp.losses.DiceLoss(MULTICLASS_MODE, classes=[1..C],
    from_logits=True)`` (``tools/ssl_finetune.py:287-288``): softmax probs,
    per-class soft dice over (batch, pixels), classes absent from the target
    zeroed, then the mean over the selected class subset.

All functions are jit-friendly and bf16-safe (reductions in fp32).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = [
    "cosine_similarity",
    "simsiam_loss",
    "msfwsi_loss",
    "dice_loss",
    "dice_loss_packed",
]


def cosine_similarity(a, b, eps: float = 1e-8):
    """Row-wise cosine similarity with torch ``nn.CosineSimilarity`` clamping:
    ``dot / max(||a||*||b||, eps)`` per sample."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    return dot / jnp.maximum(na * nb, eps)


def simsiam_loss(p1, p2, z1, z2):
    """Symmetric negative cosine: ``-(cos(p1,z2)+cos(p2,z1))/2`` (batch mean).

    ``z1``/``z2`` must already carry stop-gradient (the model emits them
    detached, mirroring ``backbone.py:188-191``).
    """
    return -(cosine_similarity(p1, z2).mean() + cosine_similarity(p2, z1).mean()) * 0.5


def msfwsi_loss(outputs: dict, fuser_weights: Sequence[float]):
    """Total MSF-WSI SSL loss over the three paths and four scales.

    ``outputs`` is the :class:`~msfwsi_tpu.models.backbone.MSFWSI` output
    dict; returns ``(total, {"context": .., "target": .., "fuser": ..})``.
    """
    per_path = {}
    for path in ("context", "target", "fuser"):
        p1s, p2s, z1s, z2s = outputs[path]
        loss = 0.0
        for i, (p1, p2, z1, z2) in enumerate(zip(p1s, p2s, z1s, z2s)):
            loss += simsiam_loss(p1, p2, z1, z2) * fuser_weights[i]
        per_path[path] = loss
    total = per_path["context"] + per_path["target"] + per_path["fuser"]
    return total, per_path


def dice_loss(
    logits,
    target,
    classes: Sequence[int] | None = None,
    smooth: float = 0.0,
    eps: float = 1e-7,
    sample_mask=None,
):
    """Multiclass soft Dice loss on logits (smp-compatible).

    Args:
      logits: (N, H, W, C) float logits (NHWC — note the reference is NCHW).
      target: (N, H, W) integer class map in [0, C).
      classes: class indices to average the loss over (the reference passes
        ``[1..C]`` to exclude background 0); ``None`` averages all classes.
      sample_mask: optional (N,) bool/float — samples with 0 contribute to
        no sum (their probs *and* one-hot targets are zeroed), so the loss
        over a padded batch equals the loss over the unpadded batch exactly
        (restores the reference's drop_last=False under static shapes).

    Per class c: ``dice_c = 2*sum(p_c * 1[y=c]) / max(sum(p_c + 1[y=c]), eps)``
    with sums over (batch, pixels); ``loss_c = 1 - dice_c``, zeroed when class
    c never appears in the target; result = mean of ``loss_c`` over
    ``classes``.
    """
    import jax

    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jnp.equal(target[..., None], jnp.arange(num_classes)).astype(jnp.float32)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)[:, None, None, None]
        probs = probs * m
        onehot = onehot * m

    dims = (0, 1, 2)  # batch + spatial: smp's dims=(0, 2) on (N, C, HW)
    intersection = jnp.sum(probs * onehot, axis=dims)
    cardinality = jnp.sum(probs + onehot, axis=dims)
    score = (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)
    loss = 1.0 - score

    present = jnp.sum(onehot, axis=dims) > 0
    loss = loss * present.astype(loss.dtype)

    if classes is not None:
        loss = loss[jnp.asarray(classes)]
    return loss.mean()


def dice_loss_packed(
    logits_packed,
    target,
    classes: Sequence[int] | None = None,
    smooth: float = 0.0,
    eps: float = 1e-7,
    sample_mask=None,
):
    """:func:`dice_loss` on space-to-depth packed logits (TPU layout path).

    Args:
      logits_packed: (N, H/2, W/2, 4*C) packed logits (sub-position-major —
        the direct output of ``models.hooknet.PackedSegmentationHead`` with
        its final depth-to-space skipped).
      target: (N, H, W) integer class map — *logical* resolution.

    The softmax is taken within each sub-position's C-class group and the
    per-class sums run over (batch, packed pixels, sub-positions) — exactly
    the logical pixel set, so the result equals
    ``dice_loss(depth_to_space(logits_packed), target)`` up to fp
    reassociation, while never materializing the 128-lane-padded logical
    (N, H, W, C) logits/probs tensors.

    Implemented as a custom VJP so the *materialized* HBM footprint is
    minimal on the training hot path: the forward reads the logits once
    (bf16 under amp — no f32 upcast is folded back into the seg-head conv)
    and saves only the per-class sums; the backward recomputes the softmax
    from the logits in f32 registers and emits the cotangent in the logits
    dtype. Per-class cotangents: with ``I_c = Σ m·p_c·y_c``,
    ``P_c = Σ m·p_c``, ``dL/dp = m·(gI·y + gP)`` and the softmax pullback
    ``dz = p·(g − Σ_k p_k g_k)``.
    """
    N, h, w, C4 = logits_packed.shape
    num_classes = C4 // 4
    # (An optimization_barrier here — forcing the f32 upcast out of the
    # producing seg-head conv and into the consuming reduces — measured
    # NEGATIVE: 835 -> 807 pairs/s; XLA's producer-side convert fold is the
    # better global schedule on the v5e. Left unforced deliberately.)
    # Pack the target the same way: (N, H, W) -> (N, h, w, 4).
    t = target.reshape(N, h, 2, w, 2).transpose(0, 1, 3, 2, 4).reshape(N, h, w, 4)
    m = (
        jnp.ones((N,), jnp.float32)
        if sample_mask is None
        else sample_mask.astype(jnp.float32)
    )
    cls = None if classes is None else tuple(int(c) for c in classes)
    return _dice_packed(
        logits_packed,
        t.astype(jnp.float32),
        m,
        cls,
        float(smooth),
        float(eps),
    )


def _dice_packed_sums(z, t, m, num_classes):
    """Per-class (intersection, prob-sum, onehot-sum) over the logical
    pixel set, reading the packed logits once (f32 in-register)."""
    import jax

    N, h, w, C4 = z.shape
    zf = z.astype(jnp.float32).reshape(N, h, w, 4, num_classes)
    probs = jax.nn.softmax(zf, axis=-1)
    onehot = jnp.equal(t[..., None], jnp.arange(num_classes, dtype=jnp.float32))
    mm = m[:, None, None, None, None]
    dims = (0, 1, 2, 3)
    inter = jnp.sum(probs * onehot * mm, axis=dims)
    psum = jnp.sum(probs * mm, axis=dims)
    osum = jnp.sum(onehot * mm, axis=dims)
    return inter, psum, osum


def _dice_from_sums(inter, psum, osum, cls, smooth, eps):
    card = psum + osum
    score = (2.0 * inter + smooth) / jnp.maximum(card + smooth, eps)
    loss = (1.0 - score) * (osum > 0).astype(jnp.float32)
    if cls is not None:
        loss = loss[jnp.asarray(cls)]
    return loss.mean()


def _dice_packed_impl(z, t, m, cls, smooth, eps):
    inter, psum, osum = _dice_packed_sums(z, t, m, z.shape[-1] // 4)
    return _dice_from_sums(inter, psum, osum, cls, smooth, eps)


def _dice_packed_fwd(z, t, m, cls, smooth, eps):
    inter, psum, osum = _dice_packed_sums(z, t, m, z.shape[-1] // 4)
    return _dice_from_sums(inter, psum, osum, cls, smooth, eps), (
        z,
        t,
        m,
        inter,
        psum,
        osum,
    )


def _dice_packed_bwd(cls, smooth, eps, res, gL):
    import jax

    z, t, m, inter, psum, osum = res
    num_classes = z.shape[-1] // 4
    N, h, w, _ = z.shape

    card = psum + osum
    denom = jnp.maximum(card + smooth, eps)
    present = (osum > 0).astype(jnp.float32)
    active = (card + smooth >= eps).astype(jnp.float32)  # max() pullback
    if cls is None:
        sel = jnp.ones((num_classes,), jnp.float32) / num_classes
    else:
        sel = (
            jnp.zeros((num_classes,), jnp.float32)
            .at[jnp.asarray(cls)]
            .set(1.0 / len(cls))
        )
    w_c = gL * sel * present  # d(mean over cls)/d(loss_c)
    # loss_c = 1 - (2I + s)/denom  ->  dI = -2/denom ; dcard = (2I+s)/denom^2
    gI = w_c * (-2.0) / denom
    gP = w_c * (2.0 * inter + smooth) / jnp.square(denom) * active

    zf = z.astype(jnp.float32).reshape(N, h, w, 4, num_classes)
    probs = jax.nn.softmax(zf, axis=-1)
    onehot = jnp.equal(t[..., None], jnp.arange(num_classes, dtype=jnp.float32))
    g = (gI * onehot + gP) * m[:, None, None, None, None]
    dz = probs * (g - jnp.sum(probs * g, axis=-1, keepdims=True))
    return (
        dz.reshape(z.shape).astype(z.dtype),
        jnp.zeros_like(t),
        jnp.zeros_like(m),
    )


import jax as _jax  # noqa: E402  (module-level for the custom_vjp binding)

_dice_packed = _jax.custom_vjp(_dice_packed_impl, nondiff_argnums=(3, 4, 5))
_dice_packed.defvjp(_dice_packed_fwd, _dice_packed_bwd)
