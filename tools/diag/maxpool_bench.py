"""Microbench: stem max-pool backward — select_and_scatter (XLA autodiff)
vs the scatter-free custom VJP (ops/maxpool.py) at production stem shapes.

Run on the real TPU:  python tools/diag/maxpool_bench.py
Shapes: SSL r18 step stem (512, 112, 112, 64) bf16 and the packed-finetune
stem (64, 128, 128, 64) bf16 (two encoders x b32).

Chained inside one jit (CLAUDE.md: single-op timings through the axon
tunnel are meaningless; sync via device scalar).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from msfwsi_tpu.ops.maxpool import max_pool_3x3s2

STEPS = 30


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def bench(pool, x, label):
    def one(x):
        y, vjp = jax.vjp(pool, x)
        (dx,) = vjp(y)  # cotangent shaped like y; content irrelevant
        return dx

    @jax.jit
    def chain(x):
        def body(c, _):
            dx = one(x + c)
            return jnp.float32(dx[0, 0, 0, 0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    float(chain(x))  # compile + warm
    t0 = time.perf_counter()
    float(chain(x))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label}: {dt * 1e3:.3f} ms/iter (fwd+bwd)")
    return dt


def main():
    rng = np.random.default_rng(0)
    for shape in [(512, 112, 112, 64), (64, 128, 128, 64)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        jax.block_until_ready(x)
        print(f"-- stem {shape} bf16 --")
        a = bench(_xla_pool, x, "select_and_scatter")
        b = bench(max_pool_3x3s2, x, "scatter-free VJP  ")
        print(f"   speedup {a / b:.2f}x")


if __name__ == "__main__":
    main()
