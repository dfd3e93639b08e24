"""Space-to-depth packing for narrow-channel conv stacks (TPU layout fix).

TPU HBM layouts put the minor (channel, in NHWC) axis on the 128-wide lane
dimension; a C-channel tensor with C < 128 is physically padded to 128
lanes, inflating every HBM read/write of that tensor by 128/C. The worst
offenders in this codebase are the HookNet U-Net decoder tail — the
smp-parity channel widths (256, 128, 64, 32, 16) put C=16 at the full
256px resolution, an 8x physical inflation that makes the final decoder
block dominate the finetune step (see ROADMAP.md, round-3 trace) — and the
ResNet stem/stage-1 activations (C=64, 2x inflation, the largest tensors
of the SSL step).

The fix: run those convs in a 2x2 space-to-depth packed domain, where a
logical ``(H, W, C)`` activation becomes ``(H/2, W/2, 4C)`` — same bytes
logically, but 4x fewer padded lanes. The transformation is **exact** (not
an approximation): a logical stride-1 SAME 3x3 conv equals a stride-1 SAME
3x3 conv in the packed domain with a structured ``(3, 3, 4*Cin, 4*Cout)``
kernel built from the logical ``(3, 3, Cin, Cout)`` weights
(:func:`pack_conv3x3_kernel`), at 4x the MXU FLOPs (convs are ~1% of the
finetune step; the step is HBM-bound). BatchNorm statistics group the 4
spatial sub-positions of each logical channel, so they reduce over exactly
the same element set as the logical BN (:func:`packed_bn_reduce_axes` /
parameter tiling via :func:`tile_params`).

Packed-channel order is **sub-position-major**: packed channel
``p * C + c`` holds logical channel ``c`` at sub-position
``p = py * 2 + px`` (py/px = row/col offset in the 2x2 block). With this
order a nearest 2x upsample followed by space-to-depth is a pure channel
tile (``jnp.tile(x, (1, 1, 1, 4))``) — no data movement at all — which is
exactly the shape of the smp DecoderBlock's input
(upsample -> concat -> conv, ``models/hooknet.py:69-82``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "upsample2x_packed",
    "pack_conv3x3_kernel",
    "pack_upconv3x3_kernel",
    "pack_skipconv3x3_kernel",
    "tile_params",
]


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), sub-position-major channels.

    ``out[b, i, j, (py*2+px)*C + c] == x[b, 2*i+py, 2*j+px, c]``.
    """
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, w, py, px, C
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`: (B, h, w, 4C) -> (B, 2h, 2w, C)."""
    B, h, w, C4 = x.shape
    assert C4 % 4 == 0, C4
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, py, w, px, C
    return x.reshape(B, 2 * h, 2 * w, C)


def upsample2x_packed(x):
    """Nearest 2x upsample, emitted directly in the packed domain.

    ``space_to_depth(upsample2x_nearest(x)) == tile(x, 4 on channels)``:
    nearest upsampling writes ``x[i, j]`` to all four sub-positions of
    output block ``(i, j)``, and packed channels are sub-position-major.
    """
    return jnp.tile(x, (1, 1, 1, 4))


def pack_conv3x3_kernel(kernel):
    """Packed-domain kernel for a logical SAME stride-1 3x3 conv.

    Args:
      kernel: (3, 3, Cin, Cout) logical conv kernel (HWIO).

    Returns:
      (3, 3, 4*Cin, 4*Cout) kernel such that a SAME stride-1 conv with it
      on ``space_to_depth(x)`` equals ``space_to_depth(conv3x3(x))``.

    Derivation: logical output row ``Y = 2i + oy`` reads logical input rows
    ``Y + dy - 1``; packed tap ``u`` at output block row ``i`` reads input
    block row ``i + u - 1``, which holds logical rows ``2(i+u-1) + py``.
    Equating gives ``dy = 2u + py - oy - 1`` (valid when 0 <= dy <= 2), and
    symmetrically for columns. Each logical weight lands in exactly one
    ``(u, py)`` slot per output sub-position ``oy`` (input-row parity is
    fixed), so the packed kernel is 4/16 dense: 4x logical FLOPs when run
    as a dense conv. SAME padding in the packed domain zero-pads one block
    (two logical pixels); the extra logical ring gets no valid ``dy``/``dx``
    and therefore zero weight, so boundary behavior is exactly the logical
    SAME pad.
    """
    kh, kw, Cin, Cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    # One small einsum against a constant 0/1 routing tensor (built host-side
    # once) — compiles to a single tiny dot, unlike a scatter-per-slot build.
    packed = jnp.einsum(
        "uvpqyx,yxio->uvpiqo", jnp.asarray(_ROUTE, kernel.dtype), kernel
    )
    return packed.reshape(3, 3, 4 * Cin, 4 * Cout)


def _build_route():
    """(u, v, p_in, q_out, dy, dx) -> 1 iff logical tap (dy, dx) routes
    there (see :func:`pack_conv3x3_kernel` derivation)."""
    import numpy as np

    route = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for oy in range(2):
        for ox in range(2):
            for u in range(3):
                for v in range(3):
                    for py in range(2):
                        dy = 2 * u + py - oy - 1
                        if not 0 <= dy <= 2:
                            continue
                        for px in range(2):
                            dx = 2 * v + px - ox - 1
                            if not 0 <= dx <= 2:
                                continue
                            route[u, v, py * 2 + px, oy * 2 + ox, dy, dx] = 1.0
    return route


_ROUTE = _build_route()


def _build_up_route():
    """Routing for :func:`pack_upconv3x3_kernel`: a logical
    [nearest-2x-upsample -> SAME 3x3 conv] equals ONE ``lhs_dilation=(2,2)``
    conv taking the *packed* input directly to the *packed* output at 2x the
    packed grid — no shuffle, no materialized upsampled tensor.

    Derivation (rows; columns identical). Output packed row ``I`` holds
    logical rows ``Y = 2I + qy``; the logical conv reads upsampled rows
    ``s = Y + dy - 1``; nearest upsampling reads source logical row
    ``a = s // 2``, i.e. packed input row ``A = a // 2`` at sub-position
    ``py = a % 2``. An lhs-dilated conv reads dilated index
    ``I - pad_lo + u`` = ``2A`` (odd dilated indices are the inserted
    zeros), so tap ``u = 2A - I + pad_lo``; with ``pad_lo = 2`` every
    ``(I parity, qy, dy)`` lands in ``u ∈ {0..3}`` (window 4), even taps
    serving even output rows and odd taps odd rows. Two ``dy`` taps that
    read the same duplicated source pixel land in the same kernel slot and
    their weights sum — exactly the nearest-upsample algebra. Out-of-range
    logical reads fall on the zero padding (``pad = (2, 2)``), reproducing
    the logical SAME boundary. The routing is parity-invariant away from
    edges, so it is built at a representative interior row (I = 2 + i0)."""
    import numpy as np

    route = np.zeros((4, 4, 4, 4, 3, 3), np.float32)  # u, v, p_in, q_out, dy, dx
    for i0 in (0, 1):
        for j0 in (0, 1):
            for qy in (0, 1):
                for dy in range(3):
                    I = 2 + i0
                    a = (2 * I + qy + dy - 1) // 2
                    py, u = a % 2, 2 * (a // 2) - I + 2
                    for qx in (0, 1):
                        for dx in range(3):
                            J = 2 + j0
                            b = (2 * J + qx + dx - 1) // 2
                            px, v = b % 2, 2 * (b // 2) - J + 2
                            route[u, v, py * 2 + px, qy * 2 + qx, dy, dx] += 1
    return route


_UP_ROUTE = _build_up_route()


def pack_upconv3x3_kernel(kernel):
    """Kernel fusing [nearest 2x upsample -> logical SAME 3x3 conv] into one
    packed-to-packed conv: use with ``lhs_dilation=(2, 2)``, window strides
    (1, 1), padding ((2, 2), (2, 2)) on a packed ``(B, h, w, 4*Cin)`` input;
    the output is the packed ``(B, 2h, 2w, 4*Cout)`` conv result. Replaces
    the broadcast + depth-to-space relayout copies of an explicit packed
    upsample (the top flagged HBM ops of the round-3 finetune trace;
    measured 4.0 -> 1.3 ms at the HookNet block4 shapes, b32)."""
    kh, kw, Cin, Cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    packed = jnp.einsum(
        "uvpqyx,yxio->uvpiqo", jnp.asarray(_UP_ROUTE, kernel.dtype), kernel
    )
    return packed.reshape(4, 4, 4 * Cin, 4 * Cout)


def _build_skip_route():
    """Routing for :func:`pack_skipconv3x3_kernel`: output packed row ``i``
    holds logical conv rows ``2i + qy`` reading logical input rows
    ``2i + qy + dy - 1`` — a stride-2 window-4 conv with ``pad_lo = 1``
    (tap ``u = qy + dy``), taking the *logical* skip straight to the packed
    domain with logical-SAME boundary semantics."""
    import numpy as np

    route = np.zeros((4, 4, 4, 3, 3), np.float32)  # u, v, q_out, dy, dx
    for qy in (0, 1):
        for dy in range(3):
            for qx in (0, 1):
                for dx in range(3):
                    route[qy + dy, qx + dx, qy * 2 + qx, dy, dx] += 1
    return route


_SKIP_ROUTE = _build_skip_route()


def pack_skipconv3x3_kernel(kernel):
    """Kernel computing ``space_to_depth(conv3x3_SAME(skip))`` directly from
    the logical ``(B, 2h, 2w, Cin)`` skip: one conv with window (4, 4),
    strides (2, 2), padding ((1, 1), (1, 1)) — the skip's s2d shuffle never
    runs (measured 2.6 -> 1.8 ms at the HookNet block3 skip shapes, b32).

    (The third input family — the 2x-upsample *entry* into the packed
    domain, ``upsample2x_packed`` — stays a channel tile + packed conv: the
    equivalent summed-tap 3x3 conv on the narrow logical input measured
    ~3x slower, so it is deliberately NOT fused.)"""
    kh, kw, Cin, Cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    packed = jnp.einsum(
        "uvqyx,yxio->uviqo", jnp.asarray(_SKIP_ROUTE, kernel.dtype), kernel
    )
    return packed.reshape(4, 4, Cin, 4 * Cout)


def tile_params(p):
    """Tile per-logical-channel (C,) params to packed (4C,) channels
    (sub-position-major: plain concat of 4 copies)."""
    return jnp.tile(p, (4,))


def packed_bn_reduce_axes(x_packed, C: int):
    """Reshape a packed (B, h, w, 4C) activation for per-logical-channel
    reduction: returns a (B, h, w, 4, C) view whose axes (0, 1, 2, 3) span
    exactly the logical (batch, H, W) element set of channel ``c``."""
    B, h, w, C4 = x_packed.shape
    assert C4 == 4 * C, (C4, C)
    return x_packed.reshape(B, h, w, 4, C)
