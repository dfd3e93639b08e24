"""Microbench: fused Pallas conv+BN vs the XLA-composed equivalent, on
square-channel shapes so iterations chain (y feeds the next x) inside one
jit — the only honest way to time ops through the axon tunnel."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.ops import fusedconv as FC

ITERS = int(os.environ.get("ITERS", "30"))


def bench(name, step, x0):
    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            y, s = step(x)
            return y, acc + s[0, 0]
        y, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc + y.astype(jnp.float32)[0, 0]
    r = loop(x0); float(r)  # warm + sync
    t0 = time.perf_counter()
    r = loop(x0); float(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:8.3f} ms/op")
    return dt


def xla_step_1x1(w, ab):
    def step(x):
        xh = jnp.maximum(x.astype(jnp.float32) * ab[0] + ab[1], 0.0).astype(jnp.bfloat16)
        y = jnp.dot(xh, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        return y, jnp.stack([yf.sum(0), (yf * yf).sum(0)])
    return step


def xla_step_3x3(w, ab, H, W):
    def step(x):
        xh = jnp.maximum(x.astype(jnp.float32) * ab[0] + ab[1], 0.0).astype(jnp.bfloat16)
        y = FC._conv_xla(xh, w, (H, W), None).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        return y, jnp.stack([yf.sum(0), (yf * yf).sum(0)])
    return step


rng = np.random.default_rng(0)
for name, N, C, hw in [
    ("1x1 s1-ish N=802816 C=256", 256 * 3136, 256, None),
    ("1x1 s3-ish N=50176 C=1024", 256 * 196, 1024, None),
    ("3x3 s2 N=200704 C=128", 256 * 784, 128, (28, 28)),
    ("3x3 s3 N=50176 C=256", 256 * 196, 256, (14, 14)),
    ("3x3 s4 N=12544 C=512", 256 * 49, 512, (7, 7)),
]:
    x = jnp.asarray(rng.normal(size=(N, C)) * 0.5, jnp.bfloat16)
    ab = jnp.asarray(np.stack([np.full(C, 1.01), np.full(C, 0.01)]), jnp.float32)
    if hw is None:
        w = jnp.asarray(rng.normal(size=(C, C)) * (1 / np.sqrt(C)), jnp.bfloat16)
        t_x = bench(f"XLA   {name}", xla_step_1x1(w, ab), x)
        t_p = bench(f"FUSED {name}", lambda xx: FC.fused_conv1x1_bn(xx, ab, w, use_pallas=True), x)
    else:
        w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * (1 / np.sqrt(9 * C)), jnp.bfloat16)
        t_x = bench(f"XLA   {name}", xla_step_3x3(w, ab, *hw), x)
        t_p = bench(f"FUSED {name}", lambda xx: FC.fused_conv3x3_bn(xx, ab, w, *hw, use_pallas=True), x)
    print(f"  speedup {t_x / t_p:.2f}x")
