"""Pallas TPU kernel: fused per-sample blur-OR-sharpen-OR-passthrough.

The albu ``OneOf([GaussianBlur, Sharpen], p=0.5)`` stage
(``ssl_train.py:179-185``) applies *one* op (or none) per sample, but the
static-shape XLA formulation must compute BOTH full-resolution ops for every
sample and select. This kernel predicates per sample instead — each grid
cell reads its sample's op selector from SMEM and runs only that branch —
and performs both separable passes in one VMEM residency (the horizontal
taps are static lane rotations, stride C):

  traffic = read slab+halo once + write once, ~1/4 of the XLA select path.

Shapes: NHWC with C=3, taps up to KMAX17=17 (the bf16 blur budget; see
``ops/augment.gaussian_blur``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blur_or_sharpen_fused", "KMAX17"]

KMAX17 = 17
HALF = KMAX17 // 2  # 8
VPAD = 16
DEAD = VPAD - HALF  # 8


def _kernel(blur_ref, sharp_ref, sel_ref, x_hbm, out_ref, scratch, acc_ref, hacc_ref, sem,
            *, slab: int, C: int):
    n = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * slab, slab + 2 * VPAD), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    sel = sel_ref[0, 0, 0]  # 0 = passthrough, 1 = blur, 2 = sharpen

    # All branches anchor output column w*C at *image* column w (the blur /
    # sharpen rolls land there naturally; passthrough shifts the horizontal
    # halo away with one roll). Columns >= W*C are dead and trimmed after.
    @pl.when(sel == 0)
    def _():
        # Mosaic rotate requires 32-bit lanes — cast half-precision up first.
        rows = scratch[VPAD : VPAD + slab, :].astype(jnp.float32)
        wcp = rows.shape[1]
        out_ref[0, :, :] = pltpu.roll(rows, (wcp - HALF * C) % wcp, axis=1).astype(
            out_ref.dtype
        )

    @pl.when(sel == 1)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for u in range(KMAX17):
            k_u = blur_ref[0, 0, u]
            acc_ref[:, :] += k_u * scratch[DEAD + u : DEAD + u + slab, :].astype(jnp.float32)
        hacc_ref[:, :] = jnp.zeros_like(hacc_ref)
        wcp = acc_ref.shape[1]
        for u in range(KMAX17):
            k_u = blur_ref[0, 0, u]
            rolled = pltpu.roll(acc_ref[:, :], (wcp - u * C) % wcp, axis=1)
            hacc_ref[:, :] += k_u * rolled
        out_ref[0, :, :] = hacc_ref[:, :].astype(out_ref.dtype)

    @pl.when(sel == 2)
    def _():
        # 3x3 sharpen: offsets dy,dx in {-1,0,1} live at padded offsets
        # HALF-1..HALF+1 (vertical) / rolls of (HALF+dx)*C (horizontal).
        hacc_ref[:, :] = jnp.zeros_like(hacc_ref)
        wcp = hacc_ref.shape[1]
        for dy in range(3):
            acc_ref[:, :] = scratch[
                DEAD + HALF - 1 + dy : DEAD + HALF - 1 + dy + slab, :
            ].astype(jnp.float32)
            for dx in range(3):
                k_v = sharp_ref[0, 0, dy * 3 + dx]
                rolled = pltpu.roll(
                    acc_ref[:, :], (wcp - (HALF - 1 + dx) * C) % wcp, axis=1
                )
                hacc_ref[:, :] += k_v * rolled
        out_ref[0, :, :] = jnp.clip(hacc_ref[:, :], 0.0, 1.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(padded, blur128, sharp128, sel, interpret=False):
    N, Hp, WCp = padded.shape
    H = Hp - 2 * VPAD
    C = 3
    slab = 128
    while H % slab:
        slab //= 2
    grid = (N, H // slab)

    out = pl.pallas_call(
        functools.partial(_kernel, slab=slab, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda n, i: (n, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda n, i: (n, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda n, i: (n, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, slab, WCp), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, WCp), padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab + 2 * VPAD, WCp), padded.dtype),
            pltpu.VMEM((slab, WCp), jnp.float32),
            pltpu.VMEM((slab, WCp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(blur128, sharp128, sel, padded)
    return out


def blur_or_sharpen_fused(img, blur_kern, sharp_kern, op_select, interpret: bool = False):
    """Apply per-sample blur (17-tap separable), sharpen (3x3, clipped), or
    passthrough.

    Args:
      img: (N, H, W, 3), H % 8 == 0.
      blur_kern: (N, 17) normalized taps (zero-masked beyond sampled ksize).
      sharp_kern: (N, 3, 3).
      op_select: (N,) int32 — 0 none, 1 blur, 2 sharpen.
    """
    N, H, W, C = img.shape
    if C != 3:
        raise ValueError("kernel is specialized for C=3 images")
    padded = jnp.pad(img, ((0, 0), (HALF, HALF), (HALF, HALF), (0, 0)), mode="reflect")
    padded = jnp.pad(padded, ((0, 0), (DEAD, DEAD), (0, 0), (0, 0)))
    padded = padded.reshape(N, H + 2 * VPAD, (W + 2 * HALF) * C)
    wcp = padded.shape[-1]
    lane_pad = (-wcp) % 128
    if lane_pad:
        padded = jnp.pad(padded, ((0, 0), (0, 0), (0, lane_pad)))

    blur128 = jnp.zeros((N, 1, 128), jnp.float32).at[:, 0, :KMAX17].set(
        blur_kern.astype(jnp.float32)
    )
    sharp128 = jnp.zeros((N, 1, 128), jnp.float32).at[:, 0, :9].set(
        sharp_kern.reshape(N, 9).astype(jnp.float32)
    )
    sel = op_select.reshape(N, 1, 1).astype(jnp.int32)

    out = _call(padded, blur128, sharp128, sel, interpret=interpret)
    return out[:, :, : W * C].reshape(N, H, W, C)
