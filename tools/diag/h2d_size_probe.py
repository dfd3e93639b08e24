"""Probe axon-tunnel H2D bandwidth vs transfer size and splitting strategy.

loader_datapath bench measured 101 MB at 1.6 GB/s, but the eval slide
upload (302 MB imgs + 100 MB masks per 128-tile chunk) runs far slower.
This times device_put for single arrays of growing size, and for the same
bytes split into per-tile trees, to find the fast-transfer envelope.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def sync(xs):
        leaves = jax.tree_util.tree_leaves(xs)
        return float(jnp.sum(leaves[-1][..., 0].astype(jnp.float32)[0]))

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (128, 1024, 1024, 3), np.uint8)

    for tiles in (1, 4, 16, 32, 64, 128):
        a = base[:tiles]
        x = jax.device_put(a)  # warm path
        sync(x)
        t0 = time.perf_counter()
        x = jax.device_put(a)
        sync(x)
        dt = time.perf_counter() - t0
        mb = a.nbytes / 1e6
        print(f"single {mb:7.0f} MB: {dt:6.3f} s  {mb/dt:8.0f} MB/s", flush=True)

    # Same 128 tiles, split into k pieces device_put'd back-to-back.
    for k in (1, 2, 4, 8, 16):
        parts = np.array_split(base, k)
        xs = [jax.device_put(p) for p in parts]
        sync(xs)
        t0 = time.perf_counter()
        xs = [jax.device_put(p) for p in parts]
        sync(xs)
        dt = time.perf_counter() - t0
        mb = base.nbytes / 1e6
        print(f"split k={k:3d} {mb:7.0f} MB: {dt:6.3f} s  {mb/dt:8.0f} MB/s", flush=True)


if __name__ == "__main__":
    main()
