"""SSL train-step tests: optimization works, param groups, multi-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.parallel import make_mesh, shard_batch, MeshSpec
from msfwsi_tpu.train import ssl as S


def tiny_config(**kw):
    defaults = dict(arch="resnet10", scale=2, img_size=32, batch_size=8, amp=False)
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


class TestLrScaling:
    def test_sqrt_batch_rule(self):
        assert tiny_config(batch_size=32, lr=1e-3).init_lr == pytest.approx(1e-3)
        assert tiny_config(batch_size=128, lr=1e-3).init_lr == pytest.approx(2e-3)

    def test_mask_ratio_keep(self):
        m = tiny_config(scale=4, mask_ratio=50).build_model()
        assert m.K == 16 and m.n_keep == 8
        m = tiny_config(scale=4, mask_ratio=75).build_model()
        assert m.n_keep == 4


class TestTrainStep:
    def test_loss_decreases(self):
        config = tiny_config()
        state = S.create_ssl_state(jax.random.key(0), config)
        batch = random_batch(config, B=8)
        step = S.make_jitted_train_step(config)
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        # Repeatedly fitting one batch must reduce the contrastive loss.
        assert losses[-1] < losses[0] - 0.05
        assert int(state.step) == 6

    def test_metrics_structure(self):
        config = tiny_config()
        state = S.create_ssl_state(jax.random.key(0), config)
        batch = random_batch(config, B=8)
        step = S.make_jitted_train_step(config, donate=False)
        _, metrics = step(state, batch)
        assert set(metrics) == {"loss", "loss_context", "loss_target", "loss_fuser"}
        total = metrics["loss_context"] + metrics["loss_target"] + metrics["loss_fuser"]
        assert float(metrics["loss"]) == pytest.approx(float(total), rel=1e-5)

    def test_ms_lr_group_scaling(self):
        # With ms_lr = [1, 0, 0], target_/inter_ params must not move.
        config = tiny_config(ms_lr=(1.0, 0.0, 0.0))
        state = S.create_ssl_state(jax.random.key(0), config)
        before = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
        batch = random_batch(config, B=8)
        step = S.make_jitted_train_step(config, donate=False)
        state, _ = step(state, batch)

        def delta(prefix):
            tot = 0.0
            for top in state.params:
                if top.startswith(prefix):
                    a = jax.tree_util.tree_leaves(state.params[top])
                    b = jax.tree_util.tree_leaves(before[top])
                    tot += sum(float(jnp.abs(x - y).sum()) for x, y in zip(a, b))
            return tot

        assert delta("context_") > 0
        assert delta("target_") == 0.0
        assert delta("inter_") == 0.0


@pytest.mark.slow  # the same both-contract equivalence is additionally
# pinned against the LITERAL reference model in test_reference_parity
# (slow tier); ~90 s of whole-model compile — full suite only
class TestShuffleViewsEquivalence:
    def test_fast_path_equals_reference_path(self):
        """shuffle_views=False (spatial views + feature-level jigsaw) must
        produce the same loss and updated params as the reference contract
        (shuffled view stacks + feature un-shuffle) for the same key."""
        from msfwsi_tpu.data.pipeline import AugConfig, make_ssl_views

        aug_cfg = AugConfig(img_size=32, grid=2, tile_px=32)
        rng = np.random.default_rng(4)
        tiles = jnp.asarray(rng.integers(0, 255, size=(4, 64, 64, 3), dtype=np.uint8))
        key = jax.random.key(21)

        results = {}
        for shuffled in (True, False):
            config = tiny_config(scale=2, shuffle_views=shuffled)
            state = S.create_ssl_state(jax.random.key(0), config)
            batch = jax.jit(
                lambda k, t: make_ssl_views(k, t, aug_cfg, shuffle_views=shuffled)
            )(key, tiles)
            step = S.make_jitted_train_step(config, donate=False)
            new_state, metrics = step(state, batch)
            results[shuffled] = (float(metrics["loss"]), new_state.params)

        loss_ref, params_ref = results[True]
        loss_fast, params_fast = results[False]
        assert loss_fast == pytest.approx(loss_ref, abs=5e-4)
        # identical math, different op order: params match to float noise
        for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_fast)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-3, rtol=0
            )


class TestRemat:
    def test_use_ac_matches_plain_loss(self):
        """Activation checkpointing (--use-ac -> nn.remat per residual
        block) must not change the math — same init, same batch, same
        first-step loss."""
        batch = random_batch(tiny_config(), B=8)
        losses = {}
        for ac in (False, True):
            config = tiny_config(use_ac=ac)
            state = S.create_ssl_state(jax.random.key(0), config)
            step = S.make_jitted_train_step(config, donate=False)
            _, metrics = step(state, batch)
            losses[ac] = float(metrics["loss"])
        assert losses[True] == pytest.approx(losses[False], rel=1e-5)


@pytest.mark.slow
class TestMultiDevice:
    def test_model_parallel_fuser_sharding(self):
        """dp x tp: fuser projector weights split over the "model" axis must
        produce the same loss as the replicated run, with the big kernels
        actually distributed."""
        from msfwsi_tpu.parallel.tp import shard_ssl_state, ssl_param_shardings

        config = tiny_config(batch_size=8)
        state = S.create_ssl_state(jax.random.key(0), config)
        batch = random_batch(config, B=8)

        mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
        tp_state = shard_ssl_state(state, mesh)

        # The widest fuser kernel is genuinely split over "model".
        from jax.sharding import PartitionSpec as P

        specs = ssl_param_shardings(state.params, mesh)
        k = specs["inter_projector_3"]["fc1"]["kernel"].spec
        assert "model" in jax.tree_util.tree_leaves(k) or k == P(None, "model") or k == P("model", None)

        tp_batch = shard_batch(mesh, batch)
        tp_step = S.make_jitted_train_step(config, mesh=mesh, donate=False, model_parallel=True)
        _, tp_metrics = tp_step(tp_state, tp_batch)

        ref_step = S.make_jitted_train_step(config, donate=False)
        _, ref_metrics = ref_step(state, batch)
        assert float(tp_metrics["loss"]) == pytest.approx(
            float(ref_metrics["loss"]), rel=1e-4, abs=1e-5
        )

    def test_meshspec_rejects_bad_model_axis(self):
        with pytest.raises(ValueError):
            MeshSpec(model=0).resolve(8)
        with pytest.raises(ValueError):
            MeshSpec(model=-2).resolve(8)
        with pytest.raises(ValueError):
            MeshSpec(model=3).resolve(8)
        assert MeshSpec(model=2).resolve(8) == (4, 2)

    def test_create_sharded_ssl_state_born_distributed(self):
        """The CLI's TP init: state comes out of the jitted init already
        under its placements (fuser kernels AND their Adam moments split
        over "model"), identical placements to materialize-then-reshard,
        and the TP step accepts it."""
        from jax.sharding import NamedSharding

        from msfwsi_tpu.parallel.tp import (
            create_sharded_ssl_state,
            shard_ssl_state,
            state_shardings,
        )

        config = tiny_config(batch_size=8)
        mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
        state = create_sharded_ssl_state(jax.random.key(0), config, mesh)

        # Same placements as the re-placement path, on every leaf.
        expected = state_shardings(state, mesh)
        for leaf, want in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(expected)
        ):
            assert isinstance(leaf.sharding, NamedSharding)
            assert leaf.sharding == want, (leaf.sharding, want)
        # The wide fuser kernel and its Adam moment are genuinely split.
        k = state.params["inter_projector_3"]["fc1"]["kernel"]
        assert "model" in tuple(k.sharding.spec)
        moments = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
            if any("inter_projector_3" in str(p) for p in path)
            and leaf.ndim == 2
        ]
        assert moments and all("model" in tuple(m.sharding.spec) for m in moments)
        # And the values match the unsharded init bit-for-bit.
        ref = S.create_ssl_state(jax.random.key(0), config)
        np.testing.assert_array_equal(
            np.asarray(k), np.asarray(ref.params["inter_projector_3"]["fc1"]["kernel"])
        )

        tp_step = S.make_jitted_train_step(
            config, mesh=mesh, donate=False, model_parallel=True
        )
        _, metrics = tp_step(state, shard_batch(mesh, random_batch(config, B=8)))
        assert np.isfinite(float(metrics["loss"]))

        # shard_ssl_state of the reference init lands on the same placements.
        resharded = shard_ssl_state(ref, mesh)
        for a, b in zip(
            jax.tree_util.tree_leaves(resharded), jax.tree_util.tree_leaves(state)
        ):
            assert a.sharding == b.sharding

    def test_shard_ssl_state_after_restore(self, tmp_path):
        """shard_ssl_state must handle a checkpoint-restored state: Orbax
        returns *committed* single-device arrays (step, Adam counts), which
        jit refuses to mix with mesh-placed params unless every leaf is
        re-placed — and the restored Adam moments must survive the
        re-placement (regression: an early version rebuilt opt_state with
        tx.init, silently zeroing the moments on a TP resume)."""
        from jax.sharding import NamedSharding

        from msfwsi_tpu.parallel.tp import shard_ssl_state
        from msfwsi_tpu.train import checkpoint as C

        config = tiny_config(batch_size=8)
        state = S.create_ssl_state(jax.random.key(0), config)
        batch = random_batch(config, B=8)
        # One step so the Adam moments are nonzero before the round trip.
        state, _ = S.make_jitted_train_step(config, donate=False)(state, batch)

        path = C.save_train_state(str(tmp_path), state, epoch=0, block=True)
        restored = C.restore_train_state(
            path, S.create_ssl_state(jax.random.key(1), config)
        )

        mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
        tp_state = shard_ssl_state(restored, mesh)

        # Every leaf is mesh-placed (no committed single-device leftovers).
        for leaf in jax.tree_util.tree_leaves(
            (tp_state.step, tp_state.params, tp_state.batch_stats, tp_state.opt_state)
        ):
            assert isinstance(leaf.sharding, NamedSharding), leaf
            assert leaf.sharding.mesh == mesh
        # The restored moments survived the re-placement.
        for placed, orig in zip(
            jax.tree_util.tree_leaves(tp_state.opt_state),
            jax.tree_util.tree_leaves(state.opt_state),
        ):
            np.testing.assert_allclose(
                np.asarray(placed), np.asarray(orig), rtol=0, atol=0
            )
        assert int(tp_state.step) == 1

        # And the TP train step accepts it.
        tp_step = S.make_jitted_train_step(
            config, mesh=mesh, donate=False, model_parallel=True
        )
        _, metrics = tp_step(tp_state, shard_batch(mesh, batch))
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_step_runs_and_matches_single(self):
        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        config = tiny_config(batch_size=8)
        state = S.create_ssl_state(jax.random.key(0), config)
        batch = random_batch(config, B=8)

        mesh = make_mesh(MeshSpec(data=8), devices=jax.devices()[:8])
        sharded_step = S.make_jitted_train_step(config, mesh=mesh, donate=False)
        sharded_batch = shard_batch(mesh, batch)
        state_sh, metrics_sh = sharded_step(state, sharded_batch)

        single_step = S.make_jitted_train_step(config, donate=False)
        state_1, metrics_1 = single_step(state, batch)

        # Global-batch math is identical regardless of sharding (BN stats are
        # global means under GSPMD == SyncBN), so losses must agree closely.
        assert float(metrics_sh["loss"]) == pytest.approx(
            float(metrics_1["loss"]), rel=1e-4, abs=1e-5
        )
        # And parameters stay in sync. Adam's first step is ±lr * sign(g);
        # where g≈0, cross-device reduction order can flip the sign (diff
        # 2*lr) — tolerate that on <1% of elements, require the rest tight.
        lr = config.init_lr
        total, flipped = 0, 0
        for a, b in zip(
            jax.tree_util.tree_leaves(state_sh.params),
            jax.tree_util.tree_leaves(state_1.params),
        ):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert d.max() <= 2.05 * lr
            flipped += int((d > 0.5 * lr).sum())
            total += d.size
        assert flipped / total < 0.01
