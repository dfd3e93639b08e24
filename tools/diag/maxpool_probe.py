"""Decompose the maxpool fwd/bwd cost: which piece is slow on the v5e."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from msfwsi_tpu.ops import maxpool as MP

STEPS = 20


def timeit(label, fn, *args):
    @jax.jit
    def chain(*args):
        def body(c, _):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.float32(leaf.ravel()[0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label}: {dt * 1e3:.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    shape = (64, 128, 128, 64)
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    Ho, Wo = shape[1] // 2, shape[2] // 2
    dy = jnp.asarray(rng.normal(size=(shape[0], Ho, Wo, shape[3])), jnp.bfloat16)
    kstar = jnp.asarray(rng.integers(0, 9, size=dy.shape), jnp.int8)
    jax.block_until_ready((x, dy, kstar))

    timeit("fwd reduce_window (nn.max_pool)",
           lambda x: nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))), x)
    timeit("fwd taps-max            ",
           lambda x: functools.reduce(jnp.maximum, MP._taps(x)), x)
    timeit("fwd taps-max + argmax   ", lambda x: MP._forward(x)[1], x)
    timeit("bwd parity-dense        ",
           lambda k, d: MP._bwd((shape[1], shape[2]), "bfloat16", k, d), kstar, dy)

    def xla_bwd(x, dy):
        _, vjp = jax.vjp(
            lambda x: nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))), x
        )
        return vjp(dy)[0]

    timeit("bwd select_and_scatter  ", xla_bwd, x, dy)


if __name__ == "__main__":
    main()
