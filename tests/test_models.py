"""Model structure tests: multi-scale ResNet encoder and MSFWSI backbone.

Everything is jitted — op-by-op eager execution on the CPU test platform is
orders of magnitude slower than compiling the whole graph once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.models import resnet as R
from msfwsi_tpu.models.backbone import MSFWSI


def jinit(model, *args, **kwargs):
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(jax.random.key(0))


class TestResNet:
    @pytest.fixture(scope="class")
    def r18(self):
        model = R.get_encoder("resnet18")
        x = jnp.zeros((2, 64, 64, 3))
        params = jinit(model, x, train=False)
        return model, params

    def test_pooled_feature_shapes_resnet18(self, r18):
        model, params = r18
        x = jnp.zeros((2, 64, 64, 3))
        feats = jax.jit(
            lambda p, x: model.apply(p, x, train=False, features="pooled")
        )(params, x)
        assert tuple(f.shape for f in feats) == ((2, 64), (2, 128), (2, 256), (2, 512))

    def test_pyramid_shapes(self, r18):
        model, params = r18
        x = jnp.zeros((2, 64, 64, 3))
        pyr = jax.jit(
            lambda p, x: model.apply(p, x, train=False, features="pyramid")
        )(params, x)
        assert tuple(p.shape for p in pyr) == (
            (2, 32, 32, 64),
            (2, 16, 16, 64),
            (2, 8, 8, 128),
            (2, 4, 4, 256),
            (2, 2, 2, 512),
        )

    def test_resnet50_expansion_dims(self):
        # The reference hardcodes [64,128,256,512] (backbone.py:67) — we fix it.
        assert R.feature_dims("resnet50") == (256, 512, 1024, 2048)
        assert R.feature_dims("resnet18") == (64, 128, 256, 512)

    def test_batch_stats_update_in_train_mode(self, r18):
        model, variables = r18
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
        _, mutated = jax.jit(
            lambda v, x: model.apply(v, x, train=True, features="pooled", mutable=["batch_stats"])
        )(variables, x)
        leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
        assert np.abs(np.asarray(leaf)).sum() > 0

    def test_unknown_arch_raises(self):
        with pytest.raises(ValueError):
            R.get_encoder("resnet19")


class TestMSFWSI:
    @pytest.fixture(scope="class")
    def small_model(self):
        # scale=2 -> K=4 target tiles; tiny images for CPU speed.
        model = MSFWSI(arch="resnet18", scale=2, mask_ratio=0.5)
        B, K, S = 2, 4, 32
        rng = np.random.default_rng(0)
        ctx = jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(B * K, S, S, 3)), jnp.float32)
        rev = jnp.stack(
            [jnp.argsort(jax.random.permutation(jax.random.key(i), K)) for i in range(B)]
        )
        variables = jax.jit(
            lambda k: model.init(k, (ctx, tgt), (ctx, tgt), (rev, rev), train=False)
        )(jax.random.key(0))
        return model, variables, (ctx, tgt), rev

    def test_output_structure(self, small_model):
        model, variables, (ctx, tgt), rev = small_model
        out, _ = jax.jit(
            lambda v: model.apply(
                v, (ctx, tgt), (ctx, tgt), (rev, rev), train=True, mutable=["batch_stats"]
            )
        )(variables)
        assert set(out) == {"context", "target", "fuser"}
        B, K = 2, 4
        dims = (64, 128, 256, 512)
        n_keep = 2
        for i, d in enumerate(dims):
            assert out["context"][0][i].shape == (B, d)
            assert out["target"][0][i].shape == (B * K, d)
            assert out["fuser"][0][i].shape == (B, d * (n_keep + 1))

    def test_stop_gradient_on_z(self, small_model):
        model, variables, (ctx, tgt), rev = small_model

        def z_sum(p):
            out, _ = model.apply(
                {**variables, "params": p},
                (ctx, tgt),
                (ctx, tgt),
                (rev, rev),
                train=True,
                mutable=["batch_stats"],
            )
            # z entries (indices 2,3) are stop-gradiented: grad wrt params == 0.
            return sum(jnp.sum(z) for z in out["context"][2]) + sum(
                jnp.sum(z) for z in out["fuser"][3]
            )

        g = jax.jit(jax.grad(z_sum))(variables["params"])
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert total == 0.0

    def test_param_group_prefixes(self, small_model):
        # The optimizer partitions on context_/target_/inter_ name prefixes
        # (ssl_train.py:281-307); our param tree must expose those prefixes.
        _, variables, _, _ = small_model
        tops = set(variables["params"].keys())
        assert any(t.startswith("context_") for t in tops)
        assert any(t.startswith("target_") for t in tops)
        assert any(t.startswith("inter_") for t in tops)
        assert all(t.startswith(("context_", "target_", "inter_")) for t in tops)

    def test_jigsaw_equivariance(self, small_model):
        """Target-path outputs must be invariant to the jigsaw shuffle:
        encoding shuffled tiles then un-shuffling features == encoding ordered
        tiles with identity permutation (eval mode, per-tile encoder)."""
        model, variables, (ctx, tgt), _ = small_model
        B, K = 2, 4
        perm = jnp.asarray([2, 0, 3, 1])
        rev = jnp.argsort(perm)[None].repeat(B, axis=0)
        ident = jnp.arange(K)[None].repeat(B, axis=0)

        tgt_tiles = tgt.reshape(B, K, *tgt.shape[1:])
        tgt_shuffled = tgt_tiles[:, perm].reshape(B * K, *tgt.shape[1:])

        apply = jax.jit(
            lambda v, t, r: model.apply(v, (ctx, t), (ctx, t), (r, r), train=False)
        )
        out_shuf = apply(variables, tgt_shuffled, rev)
        out_ident = apply(variables, tgt, ident)
        for a, b in zip(out_shuf["target"][0], out_ident["target"][0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
