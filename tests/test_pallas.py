"""Pallas TPU kernel tests (interpret mode on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.ops.pallas.blur import KMAX, separable_blur_nhwc, blur_supported


def gaussian_kernels(batch, seed=0, sigma=(0.5, 2.0)):
    rng = np.random.default_rng(seed)
    s = rng.uniform(*sigma, batch)
    taps = np.arange(-(KMAX // 2), KMAX // 2 + 1)
    k = np.exp(-0.5 * (taps[None, :] / s[:, None]) ** 2)
    return jnp.asarray(k / k.sum(1, keepdims=True), jnp.float32)


def xla_reference_blur(img, kern):
    B, H, W, _ = img.shape
    half = KMAX // 2
    padded = jnp.pad(img, ((0, 0), (half, half), (half, half), (0, 0)), mode="reflect")
    rows = jnp.zeros((B, H, W + 2 * half, 3), jnp.float32)
    for t in range(KMAX):
        rows = rows + kern[:, t, None, None, None] * padded[:, t : t + H].astype(jnp.float32)
    out = jnp.zeros((B, H, W, 3), jnp.float32)
    for t in range(KMAX):
        out = out + kern[:, t, None, None, None] * rows[:, :, t : t + W]
    return out.astype(img.dtype)


class TestPallasBlur:
    @pytest.mark.parametrize("shape", [(2, 64, 64, 3), (1, 128, 96, 3)])
    def test_matches_xla_reference(self, shape):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
        kern = gaussian_kernels(shape[0])
        out = separable_blur_nhwc(img, kern, interpret=True)
        ref = xla_reference_blur(img, kern)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_uniform_invariant(self):
        img = jnp.full((1, 64, 64, 3), 0.5, jnp.float32)
        kern = gaussian_kernels(1)
        out = separable_blur_nhwc(img, kern, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    def test_masked_taps_equal_smaller_kernel(self):
        # A 19-tap kernel zero-padded to 23 must blur identically to the
        # same 19 taps — the static KMAX loop serves all sampled ksizes.
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        k19 = np.zeros((1, KMAX), np.float32)
        taps = np.exp(-0.5 * (np.arange(-9, 10) / 1.5) ** 2)
        k19[0, 2:21] = taps / taps.sum()
        out = separable_blur_nhwc(img, jnp.asarray(k19), interpret=True)
        ref = xla_reference_blur(img, jnp.asarray(k19))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_supported_predicate(self):
        assert blur_supported((4, 1024, 1024, 3))
        assert not blur_supported((4, 1024, 1024, 4))
        assert not blur_supported((4, 1023, 1024, 3))

    def test_bf16_roundtrip(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3))).astype(jnp.bfloat16)
        kern = gaussian_kernels(1)
        out = separable_blur_nhwc(img, kern, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = xla_reference_blur(img.astype(jnp.float32), kern)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=2e-2
        )
