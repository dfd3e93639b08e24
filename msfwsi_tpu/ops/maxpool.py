"""Stem max-pool (3x3, stride 2, pad 1) with a dense, scatter-free backward.

The ResNet stem pool (``models/resnet.py``; reference
``src/models/resnet.py`` stem ``nn.MaxPool2d(3, 2, 1)``) is the one
max-pool in every model here. XLA differentiates ``reduce_window(max)``
with ``select_and_scatter_add`` — measured at ~5x its HBM roofline on the
v5e (~1.1 ms of the 35 ms packed finetune step, ~4 ms of the r18 SSL
step), and a round-2 rewrite as 9 strided ``.at[].add`` scatters was 6x
worse (ROADMAP.md). This module removes the scatter entirely:

* forward: 9 strided-slice taps -> max (same elements as reduce_window)
  plus an int8 argmax plane ``k* in 0..8`` recording the first-in-window
  row-major maximum — exactly select-and-scatter's tie-breaking order.
* backward: every input pixel receives from at most FOUR windows, and
  with pad=1/stride=2 the in-window position is determined by coordinate
  parity (even coords are window middles, odd coords are window edges):

      dx[2i,   2j]   = c4[i, j]
      dx[2i,   2j+1] = c5[i, j] + c3[i, j+1]
      dx[2i+1, 2j]   = c7[i, j] + c1[i+1, j]
      dx[2i+1, 2j+1] = c8[i, j] + c6[i, j+1] + c2[i+1, j] + c0[i+1, j+1]

  where ``ck = dy * (k* == k)``. The four parity planes assemble from
  slices/zero-pads and interleave by 2x2 nearest-upsample + parity
  select — all dense elementwise/slice/repeat ops in one fusable XLA
  DAG: no scatter, no gather, no select_and_scatter.

Bit-exactness vs the XLA autodiff backward (including bf16 ties) is
pinned by ``tests/test_maxpool.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["max_pool_3x3s2"]


def _taps(x):
    """The 9 (B, Ho, Wo, C) stride-2 window taps of the padded input,
    row-major in (r, c) — the order select_and_scatter scans windows."""
    B, H, W, C = x.shape
    Ho, Wo = (H + 1) // 2, (W + 1) // 2
    neg = jnp.asarray(-jnp.inf, x.dtype) if jnp.issubdtype(
        x.dtype, jnp.floating
    ) else jnp.iinfo(x.dtype).min
    # Pad so every window row/col index 2i+r (r=0..2) is in bounds:
    # need H + 2 >= 2 (Ho - 1) + 3  (left pad 1; right pad covers odd H).
    xp = jnp.pad(
        x,
        ((0, 0), (1, 2 * Ho + 1 - H - 1), (1, 2 * Wo + 1 - W - 1), (0, 0)),
        constant_values=neg,
    )
    taps = []
    for r in range(3):
        for c in range(3):
            taps.append(
                jax.lax.slice(
                    xp,
                    (0, r, c, 0),
                    (B, r + 2 * (Ho - 1) + 1, c + 2 * (Wo - 1) + 1, C),
                    (1, 2, 2, 1),
                )
            )
    return taps


def _forward(x):
    taps = _taps(x)
    y = functools.reduce(jnp.maximum, taps)
    # First row-major tap equal to the max — select_and_scatter's choice.
    kstar = jnp.full(y.shape, 8, jnp.int8)
    for k in range(7, -1, -1):
        kstar = jnp.where(taps[k] == y, jnp.int8(k), kstar)
    return y, kstar


def _shift_up(a):
    """a[i+1] with a zero row appended: contributions from the next window
    row (window i+1 reaching back to input row 2i+1)."""
    z = jnp.zeros_like(a[:, :1])
    return jnp.concatenate([a[:, 1:], z], axis=1)


def _shift_left(a):
    z = jnp.zeros_like(a[:, :, :1])
    return jnp.concatenate([a[:, :, 1:], z], axis=2)


def _up2(p, H, W):
    """2x nearest upsample of a parity plane, cropped to (H, W)."""
    p = jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)
    return p[:, :H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pool(x, hw, dtype_name):
    taps = _taps(x)
    return functools.reduce(jnp.maximum, taps)


def _fwd(x, hw, dtype_name):
    y, kstar = _forward(x)
    return y, kstar


def _bwd(hw, dtype_name, kstar, dy):
    H, W = hw
    c = [dy * (kstar == k) for k in range(9)]
    p_ee = c[4]
    p_eo = c[5] + _shift_left(c[3])
    p_oe = c[7] + _shift_up(c[1])
    p_oo = c[8] + _shift_left(c[6]) + _shift_up(c[2]) + _shift_up(_shift_left(c[0]))
    hp = (jnp.arange(H) % 2)[None, :, None, None]
    wp = (jnp.arange(W) % 2)[None, None, :, None]
    dx = jnp.where(
        hp == 0,
        jnp.where(wp == 0, _up2(p_ee, H, W), _up2(p_eo, H, W)),
        jnp.where(wp == 0, _up2(p_oe, H, W), _up2(p_oo, H, W)),
    )
    return (dx.astype(dtype_name),)


_pool.defvjp(_fwd, _bwd)


def max_pool_3x3s2(x):
    """3x3 / stride-2 / pad-1 max pool over NHWC, equal to
    ``nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))``
    element-for-element, with the scatter-free custom backward."""
    return _pool(x, x.shape[1:3], jnp.dtype(x.dtype).name)
