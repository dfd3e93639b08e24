"""Fused conv + BatchNorm Pallas TPU kernels for the ResNet hot path.

**Status: measured negative result — kept as an opt-in experiment.** On the
v5e these kernels reach parity with ``lax.conv`` at best in microbenchmarks
and lose in-model; the XLA dot reformulations built on the same idea
(``models/resnet._dot_bn``) also lose (-9% at B=8). See ROADMAP.md
"Fused conv+BN: measured negative result" for the full accounting. The
default model path is the unfused one.

Motivation (measured, round 3): the resnet50 SSL step spends ~70% of device
time in full-activation HBM passes around the convs — BN stat reduces, BN
normalize, and their backward — while the convs themselves are ~16%
(`tools/diag/parse_xplane.py` on the b16 trace). XLA cannot fuse a reduction
or an elementwise prologue into its convolution fusions, so every conv+BN
pair costs ~4 activation-sized HBM transfers beyond the conv's own input
read (write y, read y for stats, read y / write ŷ for normalize).

These kernels target the speed-of-light schedule for the stride-1 convs
(49 of 53 convs in resnet50, 16 of 20 in resnet18):

  ``y_raw, stats = fused_conv_bn(x_raw, ab, W)``

  * prologue: ``x̂ = relu(x·a + b)`` applied in VMEM as tiles stream in —
    ``(a, b)`` is the previous BatchNorm folded to a per-channel affine
    (``a = γ·rsqrt(σ²+ε)``, ``b = β − μ·a``), so the normalize pass of the
    *previous* BN costs zero HBM traffic;
  * MXU matmul in bf16 with fp32 accumulation (1x1 convs directly; 3x3 as
    9 shifted-row matmuls accumulating in VMEM, SAME padding via row masks);
  * epilogue: per-channel ``Σy`` / ``Σy²`` accumulated in fp32 scratch
    across the sequential TPU grid — the *next* BN's batch statistics for
    free (the stat-reduce pass also costs zero HBM traffic).

Net HBM traffic per conv+BN: read x once, write y once, plus a (2, C) stat
vector — the same traffic as a bare conv.

The backward is a hand-composed XLA pass (custom_vjp): the stats cotangent
folds into ``dy_eff = dy + ds₀ + 2·y·ds₁`` (this is exactly the BN backward
through the batch statistics), then standard conv grads on the recomputed
``x̂`` and the prologue's affine/ReLU VJP. BN training numerics are
identical to the unfused composition because the statistics are
*differentiated through* (mean/var are traced functions of ``stats``).

Semantics parity note: statistics are computed from the *bf16-rounded* conv
output (one shared ``astype(f32)`` of it feeds both the stat reduction and
the downstream normalize) — bit-parity with the unfused BatchNorm, which
also sees the rounded values; see ``_dot_bn``'s docstring for why the
shared cast matters for the backward. ``tests/test_fusedconv.py`` covers
the remaining summation-order tolerance.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "bn_fold",
    "bn_identity_ab",
    "bn_moments",
    "fused_conv1x1_bn",
    "fused_conv3x3_bn",
    "fused_supported",
]


def bn_fold(mean, var, scale, bias, eps: float = 1e-5):
    """Fold BN(mean, var, γ, β) into the per-channel affine ``x·a + b``.

    Returns a (2, C) fp32 array [a; b]. Differentiable — gradients flow
    back into the batch statistics (the BN-backward stat terms) and γ/β.
    """
    a = scale * jax.lax.rsqrt(var + eps)
    b = bias - mean * a
    return jnp.stack([a, b]).astype(jnp.float32)


def bn_identity_ab(C: int):
    """Prologue that leaves a (non-negative) input unchanged: a=1, b=0.
    (The ReLU in the prologue is a no-op on post-ReLU activations.)"""
    return jnp.stack([jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)])


def bn_moments(stats, n: int):
    """(2, C) [Σy, Σy²] -> (mean, biased var), fp32 — the BatchNorm batch
    statistics (flax semantics: biased variance, clamped at 0)."""
    mean = stats[0] / n
    var = jnp.maximum(stats[1] / n - jnp.square(mean), 0.0)
    return mean, var


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _conv1x1_kernel(x_ref, ab_ref, w_ref, y_ref, stats_ref):
    i = pl.program_id(0)
    a = ab_ref[0:1, :]
    b = ab_ref[1:2, :]
    xh = jnp.maximum(x_ref[...].astype(jnp.float32) * a + b, 0.0)
    y = jnp.dot(
        xh.astype(jnp.bfloat16), w_ref[...], preferred_element_type=jnp.float32
    )
    yb = y.astype(y_ref.dtype)
    y_ref[...] = yb
    # Stats from the *rounded* output — bit-parity with the unfused
    # BatchNorm, which sees the materialized (bf16) activation.
    yf = yb.astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    stats_ref[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _conv3x3_kernel(x_ref, ab_ref, w_ref, y_ref, stats_ref, xpad_ref, acc_ref, *, H, W, TN):
    i = pl.program_id(0)
    PAD = W + 1  # max |row shift| of the 9 taps

    a = ab_ref[0:1, :]
    b = ab_ref[1:2, :]
    xh = jnp.maximum(x_ref[...].astype(jnp.float32) * a + b, 0.0).astype(jnp.bfloat16)
    # Zero halo + block copy: shifts then never read uninitialized rows.
    xpad_ref[0:PAD, :] = jnp.zeros_like(xpad_ref[0:PAD, :])
    xpad_ref[PAD + TN:, :] = jnp.zeros_like(xpad_ref[PAD + TN:, :])
    xpad_ref[PAD:PAD + TN, :] = xh

    # Row index -> spatial position (blocks are whole-image aligned:
    # TN % (H*W) == 0, so local indices give exact h/w coordinates).
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
    w_pos = rows % W
    h_pos = (rows % (H * W)) // W

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            src = xpad_ref[PAD + dh * W + dw: PAD + dh * W + dw + TN, :]
            valid = (
                (w_pos + dw >= 0)
                & (w_pos + dw < W)
                & (h_pos + dh >= 0)
                & (h_pos + dh < H)
            )
            tap = jnp.where(valid, src, jnp.bfloat16(0))
            # Kernel tap (dh, dw) in HWIO layout maps to w_ref row block
            # (dh+1)*3 + (dw+1).
            k = (dh + 1) * 3 + (dw + 1)
            wk = w_ref[k, :, :]
            acc_ref[...] += jnp.dot(tap, wk, preferred_element_type=jnp.float32)

    yb = acc_ref[...].astype(y_ref.dtype)
    y_ref[...] = yb
    yf = yb.astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    stats_ref[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)


# --------------------------------------------------------------------------
# pallas_call wrappers (forward implementations)
# --------------------------------------------------------------------------


def _pick_tn(N: int, HW: int, c_bytes: int, target_bytes: int = 3 << 20) -> int:
    """Rows per grid step: a multiple of the image size H*W (so masks are
    image-exact) that divides N, targeting ``target_bytes`` per buffer
    (VMEM holds ~2x input + output + scratch; stay well under 16 MB)."""
    target = max(1, target_bytes // c_bytes)  # rows per buffer
    n_img = N // HW
    per = max(1, min(n_img, target // HW if HW <= target else 1))
    while n_img % per:
        per -= 1
    return per * HW


def _conv1x1_fwd_impl(x, ab, w, interpret=False):
    N, Cin = x.shape
    Cout = w.shape[-1]
    TN = _pick_tn(N, 1, max(Cin, Cout) * 2)
    grid = (N // TN,)
    return pl.pallas_call(
        _conv1x1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, Cin), lambda i: (i, 0)),
            pl.BlockSpec((2, Cin), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TN, Cout), lambda i: (i, 0)),
            pl.BlockSpec((2, Cout), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Cout), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, ab, w)


def _conv3x3_fwd_impl(x, ab, w, H, W, interpret=False):
    N, Cin = x.shape
    Cout = w.shape[-1]
    assert N % (H * W) == 0, (N, H, W)
    # 3x3 carries the halo scratch + fp32 accumulator + 9 tap temps — keep
    # the row tile small enough for the 16 MB scoped-VMEM budget.
    TN = _pick_tn(N, H * W, max(Cin, Cout) * 4, target_bytes=1 << 20)
    grid = (N // TN,)
    PAD = W + 1
    w9 = w.reshape(9, Cin, Cout)
    kern = functools.partial(_conv3x3_kernel, H=H, W=W, TN=TN)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, Cin), lambda i: (i, 0)),
            pl.BlockSpec((2, Cin), lambda i: (0, 0)),
            pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TN, Cout), lambda i: (i, 0)),
            pl.BlockSpec((2, Cout), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Cout), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TN + 2 * PAD, Cin), jnp.bfloat16),
            pltpu.VMEM((TN, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, ab, w9)


# --------------------------------------------------------------------------
# Reference (XLA) math shared by the backward
# --------------------------------------------------------------------------


def _prologue(x, ab):
    return jnp.maximum(x.astype(jnp.float32) * ab[0] + ab[1], 0.0).astype(jnp.bfloat16)


def _conv_xla(xhat2d, w, hw, bhw):
    """The conv the kernel computes, as lax.conv (used for backward grads
    and as the CPU/odd-shape fallback). xhat2d: (N, Cin)."""
    if w.ndim == 2:  # 1x1
        return jnp.dot(xhat2d, w, preferred_element_type=jnp.float32)
    H, W = hw
    B = xhat2d.shape[0] // (H * W)
    x4 = xhat2d.reshape(B, H, W, -1)
    y = jax.lax.conv_general_dilated(
        x4, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(B * H * W, -1)


def _conv_bf16(xhat2d, w, hw):
    if w.ndim == 2:
        return jnp.dot(xhat2d, w)
    H, W = hw
    B = xhat2d.shape[0] // (H * W)
    x4 = xhat2d.reshape(B, H, W, -1)
    y = jax.lax.conv_general_dilated(
        x4, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(B * H * W, -1)


# --------------------------------------------------------------------------
# custom_vjp ops
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_conv_bn(x, ab, w, hw, use_pallas):
    if use_pallas:
        if w.ndim == 2:
            return tuple(_conv1x1_fwd_impl(x, ab, w))
        return tuple(_conv3x3_fwd_impl(x, ab, w, *hw))
    y = _conv_xla(_prologue(x, ab), w, hw, None).astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, 0), jnp.sum(yf * yf, 0)])
    return y, stats


def _fused_fwd(x, ab, w, hw, use_pallas):
    y, stats = _fused_conv_bn(x, ab, w, hw, use_pallas)
    return (y, stats), (x, ab, w, y)


def _fused_bwd(hw, use_pallas, res, cot):
    """Precision caveat: with a bf16 ``y``, the incoming ``dy`` was rounded
    to bf16 *before* the BN-backward cancellation (``dy + ds₀ + 2y·ds₁``
    nearly cancels for normalization-invariant consumers), so the residual
    carries the rounding noise of the large pre-cancellation terms. Plain
    autodiff through a shared ``y.astype(f32)`` (the ``_dot_bn`` model path)
    accumulates the cancellation in fp32 and is preferred for training; this
    custom op is exact for fp32 outputs (``tests/test_fusedconv.py``)."""
    x, ab, w, y = res
    dy, ds = cot
    # Stats cotangent: d(Σy)=1, d(Σy²)=2y — the BN backward through the
    # batch statistics, folded into the output cotangent.
    dy_eff = (
        dy.astype(jnp.float32)
        + ds[0][None, :]
        + 2.0 * y.astype(jnp.float32) * ds[1][None, :]
    ).astype(jnp.bfloat16)

    xhat, pro_vjp = jax.vjp(_prologue, x, ab)
    # bf16-in/bf16-out conv for the grads: TPU convs accumulate fp32
    # internally regardless, and an all-bf16 conv keeps the transpose rules
    # dtype-consistent (a preferred_element_type=f32 conv cannot transpose
    # against a bf16 cotangent).
    _, conv_vjp = jax.vjp(lambda xh, ww: _conv_bf16(xh, ww, hw), xhat, w)
    dxhat, dw = conv_vjp(dy_eff)
    dx, dab = pro_vjp(dxhat.astype(jnp.bfloat16))
    return dx.astype(x.dtype), dab, dw.astype(w.dtype)


_fused_conv_bn.defvjp(_fused_fwd, _fused_bwd)


def fused_supported(N: int, platform: str | None = None) -> bool:
    platform = platform or jax.default_backend()
    return platform == "tpu"


def fused_conv1x1_bn(x2d, ab, w, use_pallas: bool | None = None):
    """``(N, Cin) raw -> ((N, Cout) raw, (2, Cout) stats)`` — prologue
    ``relu(x·a+b)``, 1x1 conv (matmul), stat epilogue. ``w``: (Cin, Cout)
    or (1, 1, Cin, Cout) HWIO."""
    if w.ndim == 4:
        w = w.reshape(w.shape[-2], w.shape[-1])
    if use_pallas is None:
        use_pallas = fused_supported(x2d.shape[0])
    return _fused_conv_bn(x2d, ab, w.astype(jnp.bfloat16), None, use_pallas)


def fused_conv3x3_bn(x2d, ab, w, H: int, W: int, use_pallas: bool | None = None):
    """Same for a SAME-padded stride-1 3x3 conv; ``x2d`` rows are NHWC
    flattened (image-major), ``w``: (3, 3, Cin, Cout) HWIO."""
    assert w.shape[:2] == (3, 3), w.shape
    if use_pallas is None:
        use_pallas = fused_supported(x2d.shape[0])
    return _fused_conv_bn(x2d, ab, w.astype(jnp.bfloat16), (H, W), use_pallas)
