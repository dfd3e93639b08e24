"""HookNet + finetune/eval tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.models.hooknet import HookNet
from msfwsi_tpu.train import finetune as FT
from msfwsi_tpu.train import evaluate as EV
from msfwsi_tpu.train import ssl as S


SEG = 64  # small input for CPU tests (reference uses 256)


@pytest.fixture(scope="module")
def hooknet_state():
    config = FT.FinetuneConfig(
        arch="resnet18", class_names=("a", "b", "c"), batch_size=4, amp=False, seg_size=SEG
    )
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=2)
    return config, state


def seg_batch(config, B=4, seed=0):
    rng = np.random.default_rng(seed)
    s = config.seg_size
    return {
        "context": jnp.asarray(rng.normal(size=(B, s, s, 3)), jnp.float32),
        "target": jnp.asarray(rng.normal(size=(B, s, s, 3)), jnp.float32),
        "context_mask": jnp.asarray(rng.integers(0, config.num_classes, size=(B, s, s))),
        "target_mask": jnp.asarray(rng.integers(0, config.num_classes, size=(B, s, s))),
    }


class TestHookNet:
    def test_output_shapes(self, hooknet_state):
        config, state = hooknet_state
        x = jnp.zeros((2, SEG, SEG, 3))
        ctx, tgt = jax.jit(
            lambda v, a, b: state.model.apply(v, a, b, train=False)
        )({"params": state.params, "batch_stats": state.batch_stats}, x, x)
        assert ctx.shape == (2, SEG, SEG, config.num_classes)
        assert tgt.shape == (2, SEG, SEG, config.num_classes)

    def test_bottleneck_encoder_pyramid(self):
        """HookNet must accept Bottleneck encoders (resnet50's pyramid is
        (64,256,512,1024,2048)) — the reference inherits this from smp; here
        the decoder infers skip widths, and this pins it."""
        import jax.numpy as jnp

        from msfwsi_tpu.train import finetune as FT

        config = FT.FinetuneConfig(
            arch="resnet50", class_names=("a", "b", "c"), amp=False, seg_size=64
        )
        state = FT.create_finetune_state(jax.random.key(0), config, local_batch=1)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        ctx, tgt = state.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, x, train=False
        )
        assert ctx.shape == (1, 64, 64, 4) and tgt.shape == (1, 64, 64, 4)

    def test_context_hook_crop_geometry(self, hooknet_state):
        """The context branch exports the center H/4, 128-channel crop of
        decoder block 1 (hooknet.py:29-33)."""
        config, state = hooknet_state
        x = jnp.zeros((1, SEG, SEG, 3))
        masks, feats = jax.jit(
            lambda v, a: state.model.apply(
                v, a, method=lambda m, a: m.context_branch(a, train=False)
            )
        )({"params": state.params, "batch_stats": state.batch_stats}, x)
        # For 64px input: block-1 map is 8x8 -> crop is 2x2? No: 64/32=2 head,
        # block0 -> 4, block1 -> 8; center crop h//4 = 2.
        assert feats.shape == (1, 2, 2, 128)

    def test_context_changes_target_output(self, hooknet_state):
        """The hook must actually couple the branches: different context
        input with identical target input must change the target logits."""
        config, state = hooknet_state
        rng = np.random.default_rng(1)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        tgt_in = jnp.asarray(rng.normal(size=(1, SEG, SEG, 3)), jnp.float32)
        ctx_a = jnp.asarray(rng.normal(size=(1, SEG, SEG, 3)), jnp.float32)
        ctx_b = jnp.asarray(rng.normal(size=(1, SEG, SEG, 3)), jnp.float32)
        apply = jax.jit(lambda v, c, t: state.model.apply(v, c, t, train=False))
        _, out_a = apply(variables, ctx_a, tgt_in)
        _, out_b = apply(variables, ctx_b, tgt_in)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


class TestFinetune:
    def test_lr_scaling(self):
        assert FT.FinetuneConfig(batch_size=64, lr=1e-3).init_lr == pytest.approx(1e-3)
        assert FT.FinetuneConfig(batch_size=256, lr=1e-3).init_lr == pytest.approx(2e-3)

    def test_train_step_loss_decreases(self, hooknet_state):
        config, state = hooknet_state
        batch = seg_batch(config)
        step = FT.make_jitted_finetune_step(config, donate=False)
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert metrics["tp"].shape == (4, len(config.class_names))

    def test_lam_zero_ignores_target_loss(self, hooknet_state):
        config, state = hooknet_state
        batch = seg_batch(config)
        loss_full, _ = FT.finetune_loss_fn(
            state.model, state.params, state.batch_stats, batch, lam=0.0, num_fg=3
        )
        # lam=0: loss is purely the context dice — changing the target mask
        # must not change it.
        batch2 = dict(batch, target_mask=(batch["target_mask"] * 0))
        loss2, _ = FT.finetune_loss_fn(
            state.model, state.params, state.batch_stats, batch2, lam=0.0, num_fg=3
        )
        assert float(loss_full) == pytest.approx(float(loss2), rel=1e-6)

    def test_ssl_surgery_grafts_encoders(self, hooknet_state):
        config, state = hooknet_state
        ssl_config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, amp=False)
        ssl_model = ssl_config.build_model()
        b = S.make_example_batch(ssl_config, local_batch=2)
        ssl_vars = jax.jit(
            lambda k: ssl_model.init(
                k, *S.batch_views(b, ssl_model.views_shuffled), train=False
            )
        )(jax.random.key(1))

        grafted = FT.load_ssl_encoders(state, ssl_vars)
        a = jax.tree_util.tree_leaves(grafted.params["context_branch"]["encoder"])
        bb = jax.tree_util.tree_leaves(ssl_vars["params"]["context_encoder"])
        for x, y in zip(a, bb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # decoder params untouched
        c = jax.tree_util.tree_leaves(grafted.params["context_branch"]["decoder"])
        d = jax.tree_util.tree_leaves(state.params["context_branch"]["decoder"])
        for x, y in zip(c, d):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestValidate:
    def test_per_slide_validation(self, hooknet_state):
        config, state = hooknet_state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        rng = np.random.default_rng(2)

        def slide(n_tiles, seed):
            r = np.random.default_rng(seed)
            return (
                r.normal(size=(n_tiles, SEG, SEG, 3)).astype(np.float32),
                r.normal(size=(n_tiles, SEG, SEG, 3)).astype(np.float32),
                r.integers(0, config.num_classes, size=(n_tiles, SEG, SEG)),
            )

        # Variable tile counts incl. one above the chunk size.
        slides = [slide(3, 0), slide(5, 1)]
        out = EV.validate(
            state.model, variables, slides, config.class_names, chunk=4
        )
        assert set(out) >= {"f1_micro", "iou_micro", "acc_micro", "f1_a", "iou_b", "acc_c"}
        for v in out.values():
            assert 0.0 <= v <= 1.0

    def test_u8_device_resident_path_matches_eager(self, hooknet_state):
        """validate_slide_u8 (raw uint8 tiles in, views built inside the
        chunk jit) must score identically to the eager make_seg_val_views +
        validate_slide path it replaces."""
        from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views

        config, state = hooknet_state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        r = np.random.default_rng(7)
        T = 5  # not a multiple of chunk: exercises the zero-pad tiles
        imgs = r.integers(0, 256, size=(T, 4 * SEG, 4 * SEG, 3), dtype=np.uint8)
        masks = r.integers(0, config.num_classes, size=(T, 4 * SEG, 4 * SEG)).astype(np.uint8)
        cfg = AugConfig(seg_size=SEG)

        (ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, cfg)
        f_old = EV.make_chunk_stats(state.model, 3, chunk=4)
        micro_a, sums_a = EV.validate_slide(
            f_old, variables, np.asarray(ctx), np.asarray(tgt), np.asarray(tmask),
            num_classes=3, chunk=4,
        )

        f_u8 = EV.make_chunk_stats_u8(state.model, 3, cfg=cfg)
        micro_b, sums_b = EV.validate_slide_u8(
            f_u8, variables, imgs, masks, num_classes=3, chunk=4
        )
        for k in micro_a:
            assert micro_a[k] == pytest.approx(micro_b[k], abs=1e-6)
        for x, y in zip(sums_a, sums_b):
            np.testing.assert_array_equal(x, y)

    def test_hostviews_stats_match_manual_normalize(self, hooknet_state):
        """make_chunk_stats_hostviews on uint8 pre-views must equal
        normalizing the same views manually and running make_chunk_stats —
        the on-device work is identical, only the H2D payload differs."""
        from msfwsi_tpu.data.pipeline import AugConfig
        from msfwsi_tpu.ops import augment as A

        config, state = hooknet_state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        r = np.random.default_rng(11)
        T = 5
        ctx_u8 = r.integers(0, 256, size=(T, SEG, SEG, 3), dtype=np.uint8)
        tgt_u8 = r.integers(0, 256, size=(T, SEG, SEG, 3), dtype=np.uint8)
        tmask = r.integers(0, config.num_classes, size=(T, SEG, SEG)).astype(np.int32)
        cfg = AugConfig(seg_size=SEG)

        f_host = EV.make_chunk_stats_hostviews(state.model, 3, cfg=cfg)
        micro_a, sums_a = EV.validate_slide_hostviews(
            f_host, variables, ctx_u8, tgt_u8, tmask, num_classes=3, chunk=4
        )

        ctx = np.asarray(A.normalize(jnp.asarray(ctx_u8, jnp.float32) / 255.0, cfg.mean, cfg.std))
        tgt = np.asarray(A.normalize(jnp.asarray(tgt_u8, jnp.float32) / 255.0, cfg.mean, cfg.std))
        f_old = EV.make_chunk_stats(state.model, 3, chunk=4)
        micro_b, sums_b = EV.validate_slide(
            f_old, variables, ctx, tgt, tmask, num_classes=3, chunk=4
        )
        for k in micro_a:
            assert micro_a[k] == pytest.approx(micro_b[k], abs=1e-6)
        for x, y in zip(sums_a, sums_b):
            np.testing.assert_array_equal(x, y)

    def test_padding_does_not_change_scores(self, hooknet_state):
        """Chunk padding must be score-neutral: same slide, chunk sizes that
        do / don't require padding must give identical numbers."""
        config, state = hooknet_state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        r = np.random.default_rng(3)
        ctx = r.normal(size=(6, SEG, SEG, 3)).astype(np.float32)
        tgt = r.normal(size=(6, SEG, SEG, 3)).astype(np.float32)
        masks = r.integers(0, config.num_classes, size=(6, SEG, SEG))

        f1 = EV.make_chunk_stats(state.model, 3, 6)
        micro_a, sums_a = EV.validate_slide(f1, variables, ctx, tgt, masks, 3, chunk=6)
        f2 = EV.make_chunk_stats(state.model, 3, 4)
        micro_b, sums_b = EV.validate_slide(f2, variables, ctx, tgt, masks, 3, chunk=4)
        for k in micro_a:
            assert micro_a[k] == pytest.approx(micro_b[k], abs=1e-6)
        for x, y in zip(sums_a, sums_b):
            np.testing.assert_array_equal(x, y)


class TestServingExport:
    def test_stablehlo_round_trip(self, hooknet_state, tmp_path):
        """export_hooknet_serving -> load_serving_artifact must reproduce the
        eval-mode argmax predictions exactly (weights baked into the
        artifact; signature matches the per-slide chunk loop,
        /root/reference/tools/evaluate.py:270-284)."""
        from msfwsi_tpu.train import serving

        config, state = hooknet_state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        path = serving.export_hooknet_serving(
            state.model, variables, str(tmp_path / "hooknet.stablehlo"),
            chunk=2, size=SEG,
        )

        r = np.random.default_rng(11)
        ctx = jnp.asarray(r.normal(size=(2, SEG, SEG, 3)), jnp.float32)
        tgt = jnp.asarray(r.normal(size=(2, SEG, SEG, 3)), jnp.float32)

        infer = serving.load_serving_artifact(path)
        pred = np.asarray(infer(ctx, tgt))

        _, tgt_logits = state.model.apply(variables, ctx, tgt, train=False)
        want = np.argmax(np.asarray(tgt_logits, dtype=np.float32), axis=-1)
        assert pred.dtype == np.int32
        np.testing.assert_array_equal(pred, want)
