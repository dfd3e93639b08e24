"""Fused conv+BN path: kernel correctness + model-level parity.

Covers:
  * the Pallas kernels (interpret mode) against the XLA reference math;
  * the custom_vjp backward against autodiff of the reference composition;
  * ``ResNet(fused_bn=True)`` against the unfused model with identical
    params: variable-tree equality, eval/train forwards, batch-stat
    updates, and gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.models.resnet import get_encoder
from msfwsi_tpu.ops import fusedconv as FC


class TestKernels:
    def test_conv1x1_interpret_matches_ref(self):
        rng = np.random.default_rng(0)
        N, Cin, Cout = 392, 64, 128
        x = jnp.asarray(rng.normal(size=(N, Cin)), jnp.bfloat16)
        ab = jnp.asarray(
            np.stack([rng.uniform(0.5, 1.5, Cin), rng.normal(size=Cin) * 0.1]),
            jnp.float32,
        )
        w = jnp.asarray(rng.normal(size=(Cin, Cout)) * 0.05, jnp.bfloat16)
        y_k, s_k = FC._conv1x1_fwd_impl(x, ab, w, interpret=True)
        y_r = FC._conv_xla(FC._prologue(x, ab), w, None, None).astype(jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_r))
        yf = y_r.astype(jnp.float32)
        s_r = jnp.stack([yf.sum(0), (yf * yf).sum(0)])
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r), rtol=1e-5, atol=1e-3)

    def test_conv3x3_interpret_matches_ref(self):
        rng = np.random.default_rng(1)
        H = W = 14
        B, Cin, Cout = 4, 32, 64
        N = B * H * W
        x = jnp.asarray(rng.normal(size=(N, Cin)), jnp.bfloat16)
        ab = jnp.asarray(
            np.stack([rng.uniform(0.5, 1.5, Cin), rng.normal(size=Cin) * 0.1]),
            jnp.float32,
        )
        w = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
        y_k, s_k = FC._conv3x3_fwd_impl(x, ab, w, H, W, interpret=True)
        y_r = FC._conv_xla(FC._prologue(x, ab), w, (H, W), None).astype(jnp.bfloat16)
        diff = np.abs(
            np.asarray(y_k, np.float32) - np.asarray(y_r, np.float32)
        )
        # Tap-order f32 accumulation differs from XLA's conv: ≤1 bf16 ulp.
        assert diff.max() <= 0.01, diff.max()

    def test_custom_vjp_matches_autodiff_of_reference(self):
        # f32 tensors: with a bf16 output, the custom vjp would receive the
        # output cotangent already ROUNDED to bf16 — before the BN-backward
        # cancellation (dy + ds₀ + 2y·ds₁ nearly cancels for any
        # normalization-invariant loss), so the bf16 comparison measures
        # cotangent rounding, not the vjp math. With f32 in/out the
        # cancellation happens unrounded on both sides. (The caveat is
        # documented on _fused_bwd; the production model path uses plain
        # autodiff through _dot_bn, which shares one f32 cast.)
        rng = np.random.default_rng(2)
        H = W = 8
        B, C = 2, 32
        N = B * H * W
        x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        ab = jnp.asarray(
            np.stack([rng.uniform(0.8, 1.2, C), rng.normal(size=C) * 0.1]),
            jnp.float32,
        )
        w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)

        def loss_fused(x, ab, w):
            y, s = FC.fused_conv3x3_bn(x, ab, w, H, W, use_pallas=False)
            m, v = FC.bn_moments(s, N)
            return jnp.sum(
                jnp.square((y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5))
            )

        def loss_ref(x, ab, w):
            xh = FC._prologue(x, ab)
            # bf16-in/out conv (f32 internal accum): numerically the same as
            # _conv_xla + cast, and — unlike a preferred_element_type=f32
            # conv — transposable against the bf16 cotangent under autodiff.
            y = FC._conv_bf16(xh, w.astype(jnp.bfloat16), (H, W)).astype(jnp.float32)
            s = jnp.stack([y.sum(0), (y * y).sum(0)])
            m, v = FC.bn_moments(s, N)
            return jnp.sum(jnp.square((y - m) * jax.lax.rsqrt(v + 1e-5)))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ab, w)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ab, w)
        for a, b, name in zip(gf, gr, ("dx", "dab", "dw")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32),
                np.asarray(b, np.float32),
                rtol=0.05, atol=0.05,
                err_msg=name,
            )


@pytest.fixture(scope="module")
def r50_pair():
    # 64x64 keeps stage 4 at 2x2 spatial (8 BN rows). At 32x32 stage 4 is
    # 1x1 -> BN over exactly 2 samples, where normalized values sit at ±1
    # and the fused path's E[y²]−E[y]² variance vs the unfused two-pass
    # variance flips which sample is above the mean (0↔2 swaps) — a
    # knife-edge config, not a real divergence.
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    enc_u = get_encoder("resnet50", dtype=jnp.float32)
    enc_f = get_encoder("resnet50", dtype=jnp.float32, fused_bn=True)
    variables = enc_u.init(jax.random.key(0), x, train=False)
    return enc_u, enc_f, variables, x


class TestFusedResnet:
    def test_variable_trees_identical(self, r50_pair):
        enc_u, enc_f, variables, x = r50_pair
        v_f = enc_f.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(v_f) == jax.tree_util.tree_structure(
            variables
        )
        assert jax.tree.map(jnp.shape, v_f) == jax.tree.map(jnp.shape, variables)

    def test_eval_forward_matches(self, r50_pair):
        enc_u, enc_f, variables, x = r50_pair
        fu = jax.jit(lambda v: enc_u.apply(v, x, train=False, features="pooled"))(variables)
        ff = jax.jit(lambda v: enc_f.apply(v, x, train=False, features="pooled"))(variables)
        for s, (a, b) in enumerate(zip(fu, ff)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                err_msg=f"stage {s}",
            )

    def test_train_forward_and_stats_match(self, r50_pair):
        enc_u, enc_f, variables, x = r50_pair
        run_u = jax.jit(
            lambda v: enc_u.apply(v, x, train=True, features="pooled", mutable=["batch_stats"])
        )
        run_f = jax.jit(
            lambda v: enc_f.apply(v, x, train=True, features="pooled", mutable=["batch_stats"])
        )
        ou, mu = run_u(variables)
        of, mf = run_f(variables)
        for s, (a, b) in enumerate(zip(ou, of)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-2, rtol=0,
                err_msg=f"stage {s}",
            )
        for pa, pb in zip(
            jax.tree.leaves(mu["batch_stats"]), jax.tree.leaves(mf["batch_stats"])
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-2, rtol=1e-2)

    def test_gradients_match(self, r50_pair):
        enc_u, enc_f, variables, x = r50_pair

        def make_loss(enc):
            def loss(params):
                out, _ = enc.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, features="pooled", mutable=["batch_stats"],
                )
                return sum(jnp.sum(jnp.square(o.astype(jnp.float32))) for o in out)
            return loss

        gu = jax.jit(jax.grad(make_loss(enc_u)))(variables["params"])
        gf = jax.jit(jax.grad(make_loss(enc_f)))(variables["params"])
        flat_u = jax.tree_util.tree_flatten_with_path(gu)[0]
        flat_f = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(gf)[0]}
        for k, a in flat_u:
            b = flat_f[jax.tree_util.keystr(k)]
            scale = max(1e-3, float(jnp.abs(a).max()))
            # Direction + magnitude criterion: batch-stat BN makes
            # per-channel rescalings near-invariances, so early-layer
            # BN-scale grads are small residuals of near-cancelling terms —
            # f32 summation-order differences legitimately perturb isolated
            # elements at the ~10% level (forwards agree to 2e-3, batch
            # stats to 1e-2). Cosine similarity + norm ratio + a bounded
            # elementwise tail capture "same gradient" robustly.
            af, bf = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
            name = jax.tree_util.keystr(k)
            d = np.abs(af - bf) / scale
            assert d.mean() < 0.04, f"{name}: mean {d.mean():.4f}"
            na, nb = np.linalg.norm(af), np.linalg.norm(bf)
            if na > 1e-6:
                cos = float(af @ bf) / (na * nb)
                assert cos > 0.995, f"{name}: cosine {cos:.4f}"
                assert 0.95 < nb / na < 1.05, f"{name}: norm ratio {nb / na:.4f}"
