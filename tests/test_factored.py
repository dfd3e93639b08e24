"""Fused outer-product Adafactor (train/factored.py) parity tests.

The fused path must reproduce optax.adafactor exactly (up to float
reassociation): same per-step updates on the big inter-head kernels, same
treatment of everything else, across several steps (EMA state evolution) and
in both fp32 and bf16 head storage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.train import ssl as S
from msfwsi_tpu.train.factored import fac_path_str, is_factored_kernel


def tiny_config(**kw):
    defaults = dict(
        # resnet10: same (64,128,256,512) stage dims as resnet18 (the head
        # shapes the assertions pin), half the blocks to compile.
        arch="resnet10", scale=2, img_size=32, batch_size=4, amp=False,
        mask_ratio=50,
    )
    defaults.update(kw)
    return S.SSLConfig(**defaults)


def random_batch(config, B, seed=0):
    rng = np.random.default_rng(seed)
    K, Sz = config.scale**2, config.img_size
    rev = np.stack([rng.permutation(K) for _ in range(B)])
    t1, t2 = S.target_keys(config.shuffle_views)
    return {
        "context1": jnp.asarray(rng.normal(size=(B, Sz, Sz, 3)), jnp.float32),
        "context2": jnp.asarray(rng.normal(size=(B, Sz, Sz, 3)), jnp.float32),
        t1: jnp.asarray(rng.normal(size=(B * K, Sz, Sz, 3)), jnp.float32),
        t2: jnp.asarray(rng.normal(size=(B * K, Sz, Sz, 3)), jnp.float32),
        "rev1": jnp.asarray(np.argsort(rev, axis=1)),
        "rev2": jnp.asarray(np.argsort(rev, axis=1)),
    }


def run_steps(config, n_steps=3, B=4):
    state = S.create_ssl_state(jax.random.key(0), config)
    step = S.make_jitted_train_step(config, donate=False)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, random_batch(config, B, seed=100 + i))
        losses.append(float(metrics["loss"]))
    return state, losses


class TestFusedAdafactorParity:
    @pytest.mark.parametrize("inter_dtype", ["float32", "bfloat16"])
    def test_matches_optax_adafactor(self, inter_dtype):
        """3 steps with inter_opt='fused_adafactor' must equal
        inter_opt='adafactor' on every parameter (the fused path changes the
        dataflow, not the math)."""
        # Adam steps on near-zero grads amplify 1-ulp forward differences
        # (the taps change fusion order globally), so per-element noise can
        # reach a small fraction of lr (~3.5e-4 here); wrong math would be
        # orders of magnitude larger.
        tol = 5e-5 if inter_dtype == "float32" else 1e-2
        cfg_ref = tiny_config(inter_opt="adafactor", inter_dtype=inter_dtype)
        cfg_fac = tiny_config(inter_opt="fused_adafactor", inter_dtype=inter_dtype)
        st_ref, losses_ref = run_steps(cfg_ref)
        st_fac, losses_fac = run_steps(cfg_fac)

        # The SimSiam loss sits near 0 at init, so a few 1e-6 of absolute
        # reassociation drift is a large relative error; bound both. bf16
        # head storage rounds every update to bf16 resolution, so the loss
        # trajectory drifts faster there.
        loss_rtol = 1e-3 if inter_dtype == "float32" else 5e-2
        np.testing.assert_allclose(losses_fac, losses_ref, rtol=loss_rtol, atol=1e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(st_ref.params)
        flat_fac = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(st_fac.params)
        )
        # Where a gradient element is ~0, Adam's first steps are +-lr*sign
        # and 1-ulp forward differences (the taps change fusion order
        # globally) can flip the sign — diff up to ~2*lr on a vanishing
        # fraction of elements. Everything else must be tight.
        lr = tiny_config().init_lr
        checked_big = 0
        for path, ref in flat_ref:
            fac = np.asarray(flat_fac[jax.tree_util.keystr(path)], np.float32)
            refa = np.asarray(ref, np.float32)
            d = np.abs(fac - refa)
            name = jax.tree_util.keystr(path)
            assert d.max() <= max(2.5 * lr * (1 if inter_dtype == "float32" else 4), 0), name
            # Count-based with a floor of 2: a pure fraction made single
            # sign-flips fail on small leaves (1 of a 512-wide BN bias is
            # already 2e-3; any init perturbation re-rolls which near-zero
            # gradient elements sit on the flip boundary).
            loose_n = int((d > tol + tol * np.abs(refa)).sum())
            # 5e-3: measured worst-leaf flip fractions up to 2.6e-3 on the
            # resnet10 config (the arch swap re-rolls which near-zero
            # elements straddle the boundary; r18 measured ~1e-3). The
            # primary bound is the d.max() <= 2.5*lr assert above — this
            # count bound only flags a systematic (not reassociation-
            # noise) divergence, for which 0.5% is ample headroom.
            assert loose_n <= max(2, int(5e-3 * d.size)), (
                f"{name}: {loose_n}/{d.size} elements off"
            )
            if is_factored_kernel(path, ref):
                checked_big += 1
        # r10/scale2 heads (same dims as r18): 4 scales x (proj fc1-3 + pred
        # fc1-2), minus the
        # kernels optax would not factor (dim < 128).
        assert checked_big >= 12

    def test_label_split_matches_optax_factoring_rule(self):
        """Kernels optax would NOT factor (2nd-largest dim < 128) must stay
        in the plain adafactor group — r18/scale2's pred fc1 at the first
        scales has d//4 = 48 and 96."""
        config = tiny_config(inter_opt="fused_adafactor")
        state = S.create_ssl_state(jax.random.key(0), config)
        labels = jax.tree_util.tree_map_with_path(
            lambda p, v: S._param_group(p, v, True), state.params
        )
        flat = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(labels)
        }
        assert flat["['inter_predictor_0']['fc1']['kernel']"] == "inter"  # 192x48
        assert flat["['inter_projector_0']['fc1']['kernel']"] == "inter_fac"  # 192x192
        assert flat["['inter_predictor_3']['fc1']['kernel']"] == "inter_fac"  # 1536x384
        assert flat["['inter_projector_0']['bn1']['scale']"] == "inter"
        assert flat["['context_projector_0']['fc1']['kernel']"] == "context"

    def test_fac_path_str(self):
        config = tiny_config(inter_opt="fused_adafactor")
        state = S.create_ssl_state(jax.random.key(0), config)
        paths = [
            fac_path_str(p)
            for p, v in jax.tree_util.tree_leaves_with_path(state.params)
            if is_factored_kernel(p, v)
        ]
        assert "inter_projector_0/fc1" in paths
        assert "inter_predictor_3/fc2" in paths
