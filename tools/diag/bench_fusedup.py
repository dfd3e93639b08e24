"""TPU microbench: fused-upsample conv1 formulations vs the shuffle+conv
compositions they replace, at the real packed-decoder shapes (b32).

Each formulation is chained ITERS times inside one jit (axon dispatch
overhead is ~35-40 ms — single-op timings are meaningless otherwise).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from msfwsi_tpu.ops import s2d

DN = ("NHWC", "HWIO", "NHWC")
ITERS = int(os.environ.get("ITERS", "30"))
B = int(os.environ.get("B", "32"))
rng = np.random.default_rng(0)


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


def conv(x, k, stride=1, padding="SAME", lhs_dilation=None):
    return lax.conv_general_dilated(
        x, k, (stride, stride), padding,
        lhs_dilation=None if lhs_dilation is None else (lhs_dilation, lhs_dilation),
        dimension_numbers=DN)


def _packed_upsample2x(t):
    Bb, hh, ww, C4 = t.shape
    t = t.reshape(Bb, hh, ww, 4, 1, C4 // 4)
    t = jnp.broadcast_to(t, (Bb, hh, ww, 4, 4, C4 // 4)).reshape(Bb, hh, ww, 4 * C4)
    return s2d.depth_to_space(t)


def chain(fn, x, n=ITERS):
    def body(x, _):
        y = fn(x)
        # feed a same-shaped input back so the op can't be CSE'd/DCE'd
        return x * 0.999 + 0.001 * jnp.mean(y), None
    return lax.scan(body, x, None, length=n)[0]


def timeit(name, fn, x):
    f = jax.jit(lambda x: chain(fn, x))
    r = f(x)
    float(jnp.mean(r))  # compile+sync
    t0 = time.perf_counter()
    r = f(x)
    float(jnp.mean(r))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {ms:8.3f} ms/iter")
    return ms


# block4 upconv shapes: xp (B,64,64,128) repr logical (128,128,32) -> out (B,128,128,64)
w4 = jnp.asarray(rng.normal(size=(3, 3, 32, 16)), jnp.float32)
xp = jnp.asarray(rng.normal(size=(B, 64, 64, 128)), jnp.bfloat16)
Kp = s2d.pack_conv3x3_kernel(w4).astype(jnp.bfloat16)
Ku = jnp.asarray(np.asarray(
    jnp.einsum("uvpqyx,yxio->uvpiqo",
               jnp.asarray(build_up_route()),
               w4).reshape(4, 4, 128, 64)), jnp.bfloat16)
timeit("block4: upsample2x + packed conv", lambda x: conv(_packed_upsample2x(x), Kp), xp)
timeit("block4: lhs_dilation=2 fused conv", lambda x: conv(x, Ku, padding=((2, 2), (2, 2)), lhs_dilation=2), xp)

# block3 skip shapes: skip (B,128,128,64) -> packed out (B,64,64,128)
w3 = jnp.asarray(rng.normal(size=(3, 3, 64, 32)), jnp.float32)
skip = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.bfloat16)
Kp3 = s2d.pack_conv3x3_kernel(w3).astype(jnp.bfloat16)
K4 = jnp.asarray(np.asarray(
    jnp.einsum("uvqyx,yxio->uviqo",
               jnp.asarray(build_skip_route()),
               w3).reshape(4, 4, 64, 128)), jnp.bfloat16)
timeit("block3 skip: s2d + packed conv", lambda x: conv(s2d.space_to_depth(x), Kp3), skip)
timeit("block3 skip: 4x4 stride-2 fused conv", lambda x: conv(x, K4, stride=2, padding=((1, 1), (1, 1))), skip)

# block3 tile path: x (B,64,64,64) -> packed out (B,64,64,128)
x3 = jnp.asarray(rng.normal(size=(B, 64, 64, 64)), jnp.bfloat16)
K3 = jnp.asarray(np.asarray(
    jnp.einsum("tsqyx,yxio->tsiqo",
               jnp.asarray(build_tile_route()),
               w3).reshape(3, 3, 64, 128)), jnp.bfloat16)
timeit("block3 tile: tile4 + packed conv", lambda x: conv(jnp.tile(x, (1, 1, 1, 4)), Kp3), x3)
timeit("block3 tile: 3x3 summed fused conv", lambda x: conv(x, K3), x3)
