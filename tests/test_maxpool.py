"""Scatter-free stem max-pool: bit-exactness vs the XLA composition.

The custom op must be indistinguishable from
``nn.max_pool(..., (3,3), (2,2), pad 1)`` + its select-and-scatter
autodiff backward — forward values AND gradients, including tie-breaking
(select_and_scatter keeps the first row-major max; ties are common in
bf16 activations)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfwsi_tpu.ops.maxpool import max_pool_3x3s2


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 12)])
def test_forward_bit_exact(dtype, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 8)), dtype)
    got = jax.jit(max_pool_3x3s2)(x)
    want = jax.jit(_xla_pool)(x)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 12)])
def test_backward_bit_exact(dtype, hw):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, *hw, 8)), dtype)
    # Engineer ties: bf16 rounding makes many; add exact duplicates too.
    x = x.at[:, 1::2].set(x[:, ::2][:, : x.shape[1] // 2])
    cot = jnp.asarray(rng.normal(size=(2, (hw[0] + 1) // 2, (hw[1] + 1) // 2, 8)), dtype)

    def loss(pool, x):
        return jnp.sum(pool(x).astype(jnp.float32) * cot.astype(jnp.float32))

    g_got = jax.jit(jax.grad(lambda x: loss(max_pool_3x3s2, x)))(x)
    g_want = jax.jit(jax.grad(lambda x: loss(_xla_pool, x)))(x)
    assert g_got.dtype == g_want.dtype
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


def test_every_window_position_claims():
    """A strictly increasing ramp makes each window's max its bottom-right
    tap; a reversed ramp its top-left — exercising claim paths k=0 and k=8
    plus the boundary shifts."""
    H = W = 8
    ramp = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    for x in (ramp, ramp[:, ::-1, ::-1]):
        g1 = jax.grad(lambda x: jnp.sum(max_pool_3x3s2(x)))(x)
        g2 = jax.grad(lambda x: jnp.sum(_xla_pool(x)))(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
