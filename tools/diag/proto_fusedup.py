"""Numeric validation of the fused-upsample/skip conv1 kernel constructions
(prototype for ops/s2d.py additions). All three must be EXACT (f64) vs the
composition they replace:

  tileconv:  conv3x3(x, K3)            == conv_packed(tile(x,4), pack(w))
  skipconv:  conv4x4s2(skip, K4)       == conv_packed(s2d(skip), pack(w))
  upconv:    conv4x4_lhsdil2(xp, Ku)   == conv_packed(_packed_upsample2x(xp), pack(w))
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax
from msfwsi_tpu.ops import s2d

DN = ("NHWC", "HWIO", "NHWC")
rng = np.random.default_rng(0)


def conv(x, k, stride=1, padding="SAME", lhs_dilation=None):
    return lax.conv_general_dilated(
        x, k, (stride, stride), padding,
        lhs_dilation=None if lhs_dilation is None else (lhs_dilation, lhs_dilation),
        dimension_numbers=DN)


def packed_conv(xp, w):
    return conv(xp, s2d.pack_conv3x3_kernel(w))


def build_tile_route():
    R = np.zeros((3, 3, 4, 3, 3), np.float64)  # t, tt, q, dy, dx
    for qy in (0, 1):
        for dy in range(3):
            i = 2
            a = (2 * i + qy + dy - 1) // 2
            t = a - i + 1
            for qx in (0, 1):
                for dx in range(3):
                    j = 2
                    b = (2 * j + qx + dx - 1) // 2
                    tt = b - j + 1
                    R[t, tt, qy * 2 + qx, dy, dx] += 1
    return R


def build_skip_route():
    R = np.zeros((4, 4, 4, 3, 3), np.float64)  # u, v, q, dy, dx
    for qy in (0, 1):
        for dy in range(3):
            u = qy + dy
            for qx in (0, 1):
                for dx in range(3):
                    v = qx + dx
                    R[u, v, qy * 2 + qx, dy, dx] += 1
    return R


def build_up_route():
    R = np.zeros((4, 4, 4, 4, 3, 3), np.float64)  # u, v, p_in, q_out, dy, dx
    for i0 in (0, 1):
        for j0 in (0, 1):
            for qy in (0, 1):
                for dy in range(3):
                    I = 2 + i0
                    s = 2 * I + qy + dy - 1
                    a = s // 2
                    py, A = a % 2, a // 2
                    u = 2 * A - I + 2
                    assert 0 <= u < 4, (i0, qy, dy, u)
                    for qx in (0, 1):
                        for dx in range(3):
                            J = 2 + j0
                            ss = 2 * J + qx + dx - 1
                            b = ss // 2
                            px, Bb = b % 2, b // 2
                            v = 2 * Bb - J + 2
                            assert 0 <= v < 4
                            R[u, v, py * 2 + px, qy * 2 + qx, dy, dx] += 1
    return R


Ci, Co, B, h = 3, 5, 2, 8
w = jnp.asarray(rng.normal(size=(3, 3, Ci, Co)))

# --- tileconv: x logical (B,h,w,Ci); ref = packed conv on tile(x,4)
x = jnp.asarray(rng.normal(size=(B, h, h, Ci)))
ref = packed_conv(jnp.tile(x, (1, 1, 1, 4)), w)
K3 = jnp.einsum("tsqyx,yxio->tsiqo", jnp.asarray(build_tile_route()), w).reshape(3, 3, Ci, 4 * Co)
got = conv(x, K3)
print("tileconv:", np.abs(np.asarray(ref - got)).max())

# --- skipconv: skip logical (B,2h,2w,Ci); ref = packed conv on s2d(skip)
skip = jnp.asarray(rng.normal(size=(B, 2 * h, 2 * h, Ci)))
ref = packed_conv(s2d.space_to_depth(skip), w)
K4 = jnp.einsum("uvqyx,yxio->uviqo", jnp.asarray(build_skip_route()), w).reshape(4, 4, Ci, 4 * Co)
got = conv(skip, K4, stride=2, padding=((1, 1), (1, 1)))
print("skipconv:", np.abs(np.asarray(ref - got)).max())

# --- upconv: xp packed (B,h,w,4Ci) repr. logical 2h; ref = packed conv on packed 2x upsample
xp = jnp.asarray(rng.normal(size=(B, h, h, 4 * Ci)))


def _packed_upsample2x(t):
    Bb, hh, ww, C4 = t.shape
    t = t.reshape(Bb, hh, ww, 4, 1, C4 // 4)
    t = jnp.broadcast_to(t, (Bb, hh, ww, 4, 4, C4 // 4)).reshape(Bb, hh, ww, 4 * C4)
    return s2d.depth_to_space(t)


ref = packed_conv(_packed_upsample2x(xp), w)
Ku = jnp.einsum("uvpqyx,yxio->uvpiqo", jnp.asarray(build_up_route()), w).reshape(4, 4, 4 * Ci, 4 * Co)
got = conv(xp, Ku, padding=((2, 2), (2, 2)), lhs_dilation=2)
print("upconv:", np.abs(np.asarray(ref - got)).max())
print("shapes:", ref.shape, got.shape)
