"""Pallas TPU kernel: separable per-sample Gaussian blur.

The XLA formulation (23 shifted FMAs per axis, ``ops/augment.py``) re-reads
the padded image from HBM once per tap — ~23x the necessary traffic. This
kernel DMAs each row-slab into VMEM once (with halo), accumulates all taps
in VMEM, and writes the slab once.

Design notes (Mosaic constraints drove the shape):
  * channels merge into lanes as (H, W*C), so a *vertical* pass is pure
    sublane-shifted FMAs — no lane realignment anywhere;
  * the separable blur = vertical pass -> transpose H<->W (XLA, HBM-speed)
    -> vertical pass -> transpose back. Lane-offset windows (stride C) are
    unaligned for Mosaic, so the transpose formulation wins;
  * taps run in a ``fori_loop`` accumulating through a VMEM ref — an
    unrolled value-sum keeps every shifted window alive and overflows the
    VMEM stack;
  * DMA slabs are 8-row aligned via a DEAD+reflect vertical pad (VPAD=16).

Per-sample kernels (the albu GaussianBlur samples ksize/sigma per image,
``ssl_train.py:181``) arrive as a (N, KMAX) weight matrix; masked taps are
zero, so one static KMAX-tap loop serves every sampled kernel size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["separable_blur_nhwc", "blur_supported", "KMAX"]

KMAX = 23
HALF = KMAX // 2
# Vertical pad rounded up to a DMA-friendly multiple of 8 sublanes: 5 dead +
# 11 reflect rows on each side; slabs fetch slab+32 aligned rows.
VPAD = 16
DEAD = VPAD - HALF


def blur_supported(shape) -> bool:
    # H/W must exceed HALF: the reflect pad of HALF rows needs dim-1 >= HALF
    # (jnp.pad mode="reflect" raises otherwise) — an 8px image passed the
    # old alignment-only check and crashed at trace time.
    _, H, W, C = shape
    return C == 3 and H % 8 == 0 and W % 8 == 0 and H > HALF and W > HALF


def _vblur_kernel(kern_ref, x_hbm, out_ref, scratch, acc_ref, sem, *, slab: int):
    n = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * slab, slab + 2 * VPAD), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    # Static tap unroll with accumulation *through the VMEM ref*: dynamic
    # sublane starts would need 8-alignment Mosaic can't prove, and a
    # pure-value unrolled sum keeps every window alive on the VMEM stack.
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    for t in range(KMAX):
        k_t = kern_ref[0, 0, t]
        acc_ref[:, :] += k_t * scratch[DEAD + t : DEAD + t + slab, :].astype(jnp.float32)
    out_ref[0, :, :] = acc_ref[:, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vblur(x, kern128, interpret=False):
    """Vertical-only blur: x (N, H, WC) -> (N, H, WC), taps along axis 1."""
    N, H, WC = x.shape
    padded = jnp.pad(x, ((0, 0), (HALF, HALF), (0, 0)), mode="reflect")
    padded = jnp.pad(padded, ((0, 0), (DEAD, DEAD), (0, 0)))
    lane_pad = (-WC) % 128
    if lane_pad:
        padded = jnp.pad(padded, ((0, 0), (0, 0), (0, lane_pad)))
    WCp = WC + lane_pad

    slab = 128
    while H % slab:
        slab //= 2
    grid = (N, H // slab)

    out = pl.pallas_call(
        functools.partial(_vblur_kernel, slab=slab),
        grid=grid,
        in_specs=[
            # Per-sample tap weights in SMEM — scalar reads at a *dynamic*
            # tap index are only legal from scalar memory.
            pl.BlockSpec((1, 1, 128), lambda n, i: (n, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, slab, WCp), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, WCp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab + 2 * VPAD, WCp), x.dtype),
            pltpu.VMEM((slab, WCp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kern128, padded)
    return out[:, :, :WC] if lane_pad else out


def separable_blur_nhwc(img, kern, interpret: bool = False):
    """Blur (N, H, W, 3) images with per-sample 1-D kernels (N, KMAX).

    REFLECT_101 boundary handling (cv2 default); masked taps in ``kern``
    must be zero and each row must sum to 1. Accumulates fp32, returns the
    input dtype.
    """
    N, H, W, C = img.shape
    if C != 3:
        raise ValueError("kernel is specialized for C=3 images")
    kern128 = jnp.zeros((N, 1, 128), jnp.float32).at[:, 0, :KMAX].set(
        kern.astype(jnp.float32)
    )
    # Pass 1: vertical taps on (N, H, W*C).
    v = _vblur(img.reshape(N, H, W * C), kern128, interpret=interpret)
    # Pass 2: transpose H<->W (lane<->sublane swap happens at HBM speed in
    # XLA) and blur the W axis the same way.
    vt = v.reshape(N, H, W, C).transpose(0, 2, 1, 3).reshape(N, W, H * C)
    h = _vblur(vt, kern128, interpret=interpret)
    return h.reshape(N, W, H, C).transpose(0, 2, 1, 3)
