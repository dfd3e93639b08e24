"""Measure achievable HBM bandwidth on the attached TPU.

Chained elementwise adds separated by optimization_barrier (forces each add
to materialize — no fusion, no scan carry double-buffering), synced via a
device scalar (axon block_until_ready under-synchronizes)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp

ITERS = 20
for MB in (256, 1024):
    n = MB * 1024 * 1024 // 2  # bf16 elems
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def chain(x):
        y = x
        for _ in range(ITERS):
            y = jax.lax.optimization_barrier(y + jnp.bfloat16(1.0))
        return y, jnp.sum(y[:8])

    y, s = chain(x); float(s)
    t0 = time.perf_counter()
    y, s = chain(x); float(s)
    dt = time.perf_counter() - t0
    bytes_moved = ITERS * 2 * n * 2  # read+write per iter, 2B/elem
    print(f"{MB} MB array: {bytes_moved/dt/1e9:.0f} GB/s ({dt*1e3:.1f} ms / {ITERS} iters)")
