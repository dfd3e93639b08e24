"""Gradient accumulation (SSLConfig.accum_steps / FinetuneConfig.accum_steps).

Semantics under test: accum_steps splits the global batch into sequential
microbatches inside the one jitted step and applies a single optimizer
update on the averaged gradient (beyond-parity capability — the reference
has none; it makes the published global batches, e.g. resnet50 -b 32, fit
small-HBM chips).

Key identity used throughout: BN train-mode normalization depends only on
the microbatch's own statistics, so with every sample duplicated
adjacently (``duplicate_batch``) each of the two interleaved microbatches
(``slice_microbatch``: microbatch i = samples with index % accum == i)
equals the original batch ``b`` — the accumulated update must match the
unaccumulated update on ``b`` exactly (only the BN *running* stats see
two momentum updates).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.parallel import MeshSpec, make_mesh, shard_batch
from msfwsi_tpu.train import finetune as FT
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


def duplicate_batch(batch):
    """Duplicate every sample adjacently (sample-interleaved), so that the
    interleaved microbatch partition (``slice_microbatch``: microbatch i =
    samples with index % accum == i) of the doubled batch at accum=2
    reproduces the original batch in both microbatches. Handles sample-
    major B*K axes via the inferred per-sample factor."""
    B = min(a.shape[0] for a in jax.tree.leaves(batch))

    def dup(a):
        m = a.shape[0] // B
        rest = a.shape[1:]
        g = a.reshape(B, 1, m, *rest)
        g = jnp.broadcast_to(g, (B, 2, m) + tuple(rest))
        return g.reshape(2 * B * m, *rest)

    return jax.tree.map(dup, batch)


def assert_trees_close(a, b, rtol=1e-6, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_leaves_with_path(b)
    )
    for path, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(va, np.float32),
            np.asarray(vb, np.float32),
            rtol=rtol,
            atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


class TestSSLAccum:
    def test_duplicated_halves_match_unaccumulated(self):
        """accum=2 on the adjacent-duplicated batch must produce the same
        params and loss as accum=1 on b (each interleaved microbatch IS b,
        so identical microbatch gradients average to themselves)."""
        cfg1 = tiny_config()
        cfg2 = tiny_config(accum_steps=2)
        state = S.create_ssl_state(jax.random.key(0), cfg1)
        b = random_batch(cfg1, B=4, seed=7)

        s1, m1 = S.make_jitted_train_step(cfg1, donate=False)(state, b)
        s2, m2 = S.make_jitted_train_step(cfg2, donate=False)(
            state, duplicate_batch(b)
        )
        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
        assert_trees_close(s2.params, s1.params)

    @pytest.mark.slow  # independent oracle for the same semantics the
    # quick-tier duplicated-halves test pins; full-suite only (latency)
    def test_matches_mean_gradient_oracle(self):
        """accum=2 on a heterogeneous batch == one tx.update on the mean of
        the two microbatch gradients (computed independently here), with BN
        stats chained through the microbatches. The optimizer is swapped
        for plain SGD so the parameter delta IS the averaged gradient —
        a direct, tight check of the accumulation math (Adam's first step
        is ~+-lr*sign(g), which amplifies 1-ulp cross-compilation grad
        noise into +-lr param diffs and only supports loose bounds)."""
        import optax

        cfg = tiny_config(accum_steps=2)
        tx = optax.sgd(0.1)
        state = S.create_ssl_state(jax.random.key(1), cfg)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
        batch = random_batch(cfg, B=8, seed=3)
        fw = tuple(cfg.fuser_weights)

        # Independent oracle from the public loss fn.
        halves = [S.slice_microbatch(batch, 2, i) for i in range(2)]

        @jax.jit
        def oracle(params, stats0):
            stats = stats0
            grads, losses = [], []
            for mb in halves:
                (loss, (_, stats, _)), g = jax.value_and_grad(
                    lambda p, s=stats, m=mb: S.ssl_loss_fn(state.model, p, s, m, fw),
                    has_aux=True,
                )(params)
                grads.append(g)
                losses.append(loss)
            mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
            new_params = jax.tree.map(lambda p, g: p - 0.1 * g, params, mean_g)
            return new_params, stats, (losses[0] + losses[1]) / 2.0

        oracle_params, oracle_stats, oracle_loss = oracle(
            state.params, state.batch_stats
        )

        s2, m2 = S.make_jitted_train_step(cfg, donate=False)(state, batch)
        assert float(m2["loss"]) == pytest.approx(
            float(oracle_loss), rel=1e-3, abs=1e-5
        )
        assert_trees_close(s2.params, oracle_params, rtol=1e-4, atol=5e-6)
        assert_trees_close(s2.batch_stats, oracle_stats, rtol=1e-4, atol=5e-6)

    @pytest.mark.slow  # factored-path variant of the quick-tier accum
    # test; its optimizer math is pinned by test_factored — full-suite only
    def test_fused_adafactor_accum_duplicated_halves(self):
        """The fused outer-product path under accumulation: the (X, dY)
        factor sides are concatenated across microbatches with dY scaled by
        1/accum — on the adjacent-duplicated batch this must equal the
        unaccumulated fused step on b. Also proves the dense dW dots stay dead (the zeroed accumulator
        feeds nothing)."""
        cfg1 = tiny_config(batch_size=4, inter_opt="fused_adafactor")
        cfg2 = tiny_config(batch_size=4, inter_opt="fused_adafactor", accum_steps=2)
        state = S.create_ssl_state(jax.random.key(2), cfg1)
        b = random_batch(cfg1, B=4, seed=11)

        s1, m1 = S.make_jitted_train_step(cfg1, donate=False)(state, b)
        s2, m2 = S.make_jitted_train_step(cfg2, donate=False)(
            state, duplicate_batch(b)
        )
        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
        assert_trees_close(s2.params, s1.params, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow  # fused-view accumulation plumbing (exact-arithmetic
    # stub builder); distinct contract but ~2 min of compile — full suite
    def test_fused_step_builds_views_per_microbatch(self, monkeypatch):
        """The fused aug+step path under accumulation slices the raw uint8
        tiles and builds each microbatch's views inside the loop (the
        full-batch view stacks never materialize — that is the HBM point
        of accumulating). Semantics pinned: microbatch i uses views made
        with fold_in(key, i) on tiles slice i, gradients averaged, one
        update (SGD so the check is tight).

        The real aug pipeline is swapped for an exact-arithmetic stub
        (slices + one multiply + key-derived scalars/permutations): the
        SimSiam projector BNs make the loss chaotic in float noise at toy
        scale (worst with 2-sample microbatches, where a BN sees 2-point
        variances), so any through-the-real-pipeline comparison across
        two separately compiled programs is meaningless. With bit-exact
        views and 4-sample microbatches the measured fused-vs-oracle gap
        is ~2e-6 on the loss / ~5e-5 on params; tolerances are 10x that.
        View-level cross-compilation reproducibility of the real pipeline
        is pinned separately
        (test_augment.py::test_ssl_views_deterministic_across_fusion_contexts);
        this test pins the accumulation plumbing around it."""
        import optax

        from msfwsi_tpu.data import pipeline as P

        cfg = tiny_config(batch_size=8, accum_steps=2)
        aug_cfg = P.AugConfig(img_size=32, grid=2, tile_px=32)
        rng = np.random.default_rng(23)
        tiles = jnp.asarray(rng.integers(0, 255, size=(8, 64, 64, 3), dtype=np.uint8))
        key = jax.random.key(42)
        tx = optax.sgd(0.1)
        state = S.create_ssl_state(jax.random.key(6), cfg)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
        fw = tuple(cfg.fuser_weights)

        def stub_views(vkey, tiles_u8, vcfg, shuffle_views=True):
            # Exact ops only (stride slices, one multiply, integer perms),
            # so the views are bit-identical in every compilation context;
            # key- and slice-dependent, so wrong fold_in/slicing plumbing
            # changes them by O(1).
            B = tiles_u8.shape[0]
            K, s = vcfg.grid**2, vcfg.img_size
            x = tiles_u8[:, ::2, ::2, :].astype(jnp.float32) / 255.0
            u = 0.5 + jax.random.uniform(vkey, (4,))
            t = (  # the four quadrants as target tiles (exact reshape)
                tiles_u8.reshape(B, 2, s, 2, s, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(B * K, s, s, 3)
                .astype(jnp.float32)
                / 255.0
            )
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, K))(
                jax.random.split(vkey, B)
            )
            t1, t2 = S.target_keys(shuffle_views)
            rev = jnp.argsort(perm, axis=1)
            return {
                "context1": x * u[0],
                "context2": x * u[1],
                t1: t * u[2],
                t2: t * u[3],
                "rev1": rev,
                "rev2": rev,
            }

        # make_jitted_fused_step binds pipeline.make_ssl_views at call time.
        monkeypatch.setattr(P, "make_ssl_views", stub_views)

        s2, m2 = S.make_jitted_fused_step(cfg, aug_cfg, donate=False)(
            state, tiles, key
        )

        @jax.jit
        def oracle(params, stats0):
            stats = stats0
            grads, losses = [], []
            for i in range(2):
                views = stub_views(
                    jax.random.fold_in(key, i),
                    S.slice_microbatch(tiles, 2, i),
                    aug_cfg,
                    shuffle_views=cfg.shuffle_views,
                )
                (loss, (_, stats, _)), g = jax.value_and_grad(
                    lambda p, s=stats, v=views: S.ssl_loss_fn(
                        state.model, p, s, v, fw
                    ),
                    has_aux=True,
                )(params)
                grads.append(g)
                losses.append(loss)
            mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
            return (
                jax.tree.map(lambda p, g: p - 0.1 * g, params, mean_g),
                stats,
                (losses[0] + losses[1]) / 2.0,
            )

        oracle_params, oracle_stats, oracle_loss = oracle(
            state.params, state.batch_stats
        )
        assert float(m2["loss"]) == pytest.approx(
            float(oracle_loss), rel=1e-3, abs=2e-5
        )
        assert_trees_close(s2.params, oracle_params, rtol=1e-3, atol=5e-4)
        assert_trees_close(s2.batch_stats, oracle_stats, rtol=1e-2, atol=1e-3)

    def test_indivisible_batch_raises(self):
        cfg = tiny_config(accum_steps=3)
        state = S.create_ssl_state(jax.random.key(0), cfg)
        with pytest.raises(ValueError, match="not divisible"):
            S.make_jitted_train_step(cfg, donate=False)(
                state, random_batch(cfg, B=4)
            )

    def test_sharded_accum_matches_single_device(self):
        """Microbatch slices of a "data"-sharded batch keep their sharding;
        the accumulated step under an 8-device mesh must match the
        single-device result."""
        cfg = tiny_config(accum_steps=2)
        state = S.create_ssl_state(jax.random.key(4), cfg)
        batch = random_batch(cfg, B=8, seed=9)

        _, m_single = S.make_jitted_train_step(cfg, donate=False)(state, batch)

        mesh = make_mesh(MeshSpec(data=4, model=2))
        sharded = shard_batch(mesh, batch)
        _, m_mesh = S.make_jitted_train_step(cfg, mesh=mesh, donate=False)(
            state, sharded
        )
        assert float(m_mesh["loss"]) == pytest.approx(
            float(m_single["loss"]), rel=1e-4, abs=1e-5
        )


class TestFinetuneAccum:
    def _state_and_batch(self, accum):
        cfg = FT.FinetuneConfig(
            arch="resnet10",
            class_names=("a", "b", "c"),
            batch_size=4,
            amp=False,
            seg_size=64,
            accum_steps=accum,
        )
        state = FT.create_finetune_state(jax.random.key(5), cfg, local_batch=2)
        rng = np.random.default_rng(17)
        B, SEG = 4, cfg.seg_size
        batch = {
            "context": jnp.asarray(rng.normal(size=(B, SEG, SEG, 3)), jnp.float32),
            "target": jnp.asarray(rng.normal(size=(B, SEG, SEG, 3)), jnp.float32),
            "context_mask": jnp.asarray(
                rng.integers(0, cfg.num_classes, size=(B, SEG, SEG)), jnp.int32
            ),
            "target_mask": jnp.asarray(
                rng.integers(0, cfg.num_classes, size=(B, SEG, SEG)), jnp.int32
            ),
        }
        return cfg, state, batch

    def test_duplicated_halves_match_unaccumulated(self):
        cfg1, state, b = self._state_and_batch(accum=1)
        cfg2, _, _ = self._state_and_batch(accum=2)

        s1, m1 = FT.make_jitted_finetune_step(cfg1, donate=False)(state, b)
        s2, m2 = FT.make_jitted_finetune_step(cfg2, donate=False)(
            state, duplicate_batch(b)
        )
        assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
        assert_trees_close(s2.params, s1.params)
        # Per-sample train metrics keep the (N, C) contract in the
        # original (doubled) batch order: adjacent duplicates produce
        # adjacent duplicate rows.
        for k in ("tp", "fp", "fn", "tn"):
            assert m2[k].shape[0] == 8
            np.testing.assert_array_equal(np.asarray(m2[k][0::2]), np.asarray(m1[k]))
            np.testing.assert_array_equal(np.asarray(m2[k][1::2]), np.asarray(m1[k]))
