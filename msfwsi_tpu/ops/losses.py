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
    """
    import jax

    N, h, w, C4 = logits_packed.shape
    num_classes = C4 // 4
    # (N, h, w, 4, C): sub-position axis explicit, classes last.
    z = logits_packed.astype(jnp.float32).reshape(N, h, w, 4, num_classes)
    probs = jax.nn.softmax(z, axis=-1)

    # Pack the target the same way: (N, H, W) -> (N, h, w, 4).
    t = target.reshape(N, h, 2, w, 2).transpose(0, 1, 3, 2, 4).reshape(N, h, w, 4)
    onehot = jnp.equal(t[..., None], jnp.arange(num_classes)).astype(jnp.float32)

    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)[:, None, None, None, None]
        probs = probs * m
        onehot = onehot * m

    dims = (0, 1, 2, 3)  # batch + packed spatial + sub-position
    intersection = jnp.sum(probs * onehot, axis=dims)
    cardinality = jnp.sum(probs + onehot, axis=dims)
    score = (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)
    loss = 1.0 - score

    present = jnp.sum(onehot, axis=dims) > 0
    loss = loss * present.astype(loss.dtype)

    if classes is not None:
        loss = loss[jnp.asarray(classes)]
    return loss.mean()
