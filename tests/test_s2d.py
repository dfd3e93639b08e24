"""Space-to-depth packed-conv toolkit (`ops/s2d.py`) + packed HookNet
decoder tail: exactness against the logical (unpacked) computation.

The packed path is a pure layout transformation — same math, different
physical shapes — so all tests assert tight fp32 agreement with the
straightforward implementation on identical parameters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msfwsi_tpu.models.hooknet import HookNet
from msfwsi_tpu.ops import s2d


def _conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestS2DOps:
    def test_round_trip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 10, 5)), jnp.float32)
        assert jnp.array_equal(s2d.depth_to_space(s2d.space_to_depth(x)), x)

    def test_sub_position_major_order(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 3)), jnp.float32)
        p = s2d.space_to_depth(x)
        for py in range(2):
            for px in range(2):
                idx = (py * 2 + px) * 3
                np.testing.assert_array_equal(
                    p[0, 1, 1, idx : idx + 3], x[0, 2 + py, 2 + px, :]
                )

    def test_upsample_packed_is_tile(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 6, 6, 7)), jnp.float32)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        np.testing.assert_array_equal(
            s2d.upsample2x_packed(x), s2d.space_to_depth(up)
        )

    def test_packed_kernel_matches_logical_conv(self):
        rng = np.random.default_rng(3)
        # Odd-ish content + nonzero boundary to exercise SAME-pad behavior.
        x = jnp.asarray(rng.normal(size=(2, 12, 16, 5)), jnp.float32) + 1.0
        k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
        want = s2d.space_to_depth(_conv3x3(x, k))
        got = _conv3x3(s2d.space_to_depth(x), s2d.pack_conv3x3_kernel(k))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_grouped_concat_kernel(self):
        from msfwsi_tpu.models.hooknet import _pack_grouped_kernel

        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 8, 8, 5)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 6)), jnp.float32)
        want = s2d.space_to_depth(_conv3x3(jnp.concatenate([a, b], -1), k))
        xp = jnp.concatenate([s2d.space_to_depth(a), s2d.space_to_depth(b)], -1)
        got = _conv3x3(xp, _pack_grouped_kernel(k, (3, 5)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_packed_upsample2x(self):
        from msfwsi_tpu.models.hooknet import _packed_upsample2x

        x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 6, 6, 4)), jnp.float32)
        xp = s2d.space_to_depth(x)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        np.testing.assert_array_equal(_packed_upsample2x(xp), s2d.space_to_depth(up))

    def test_pack_upconv_kernel_matches_composition(self):
        """lhs_dilation=2 fused kernel == [packed 2x upsample -> packed 3x3
        conv] == fully logical [nearest up2 -> SAME conv3x3 -> s2d]."""
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 12, 16, 5)), jnp.float32) + 1.0
        k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        want = s2d.space_to_depth(_conv3x3(up, k))
        got = jax.lax.conv_general_dilated(
            s2d.space_to_depth(x),
            s2d.pack_upconv3x3_kernel(k),
            (1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_pack_skipconv_kernel_matches_composition(self):
        """Window-4 stride-2 fused kernel on the logical skip ==
        s2d(conv3x3_SAME(skip)), including the SAME boundary."""
        rng = np.random.default_rng(7)
        skip = jnp.asarray(rng.normal(size=(2, 12, 16, 5)), jnp.float32) + 1.0
        k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
        want = s2d.space_to_depth(_conv3x3(skip, k))
        got = jax.lax.conv_general_dilated(
            skip,
            s2d.pack_skipconv3x3_kernel(k),
            (2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    @pytest.mark.parametrize("x_packed,with_skip", [
        (False, True), (True, False), (True, True),
    ])
    def test_packed_entry_block_fused_equals_unfused(self, x_packed, with_skip):
        """PackedDecoderBlock with the fused entry conv equals the
        shuffle+concat formulation on identical parameters (both BN stats
        and output), for every block shape in the decoder tail."""
        from msfwsi_tpu.models.hooknet import PackedDecoderBlock

        rng = np.random.default_rng(8)
        in_ch, skip_ch, out_ch, h = 6, 5, 4, 8
        x = jnp.asarray(
            rng.normal(size=(2, h, h, 4 * in_ch if x_packed else in_ch)),
            jnp.float32,
        )
        skip_h = 4 * h if x_packed else 2 * h
        skip = (
            jnp.asarray(rng.normal(size=(2, skip_h, skip_h, skip_ch)), jnp.float32)
            if with_skip
            else None
        )
        kw = dict(out_ch=out_ch, in_ch=in_ch,
                  skip_ch=skip_ch if with_skip else 0, x_packed=x_packed)
        fused = PackedDecoderBlock(fused_entry=True, **kw)
        plain = PackedDecoderBlock(fused_entry=False, **kw)
        variables = plain.init(jax.random.key(0), x, skip, train=True)
        assert jax.tree_util.tree_structure(
            fused.init(jax.random.key(0), x, skip, train=True)
        ) == jax.tree_util.tree_structure(variables)
        run = lambda m: m.apply(variables, x, skip, train=True, mutable=["batch_stats"])
        ya, sa = run(plain)
        yb, sb = run(fused)
        np.testing.assert_allclose(yb, ya, rtol=0, atol=1e-5)
        jax.tree_util.tree_map(
            lambda u, w: np.testing.assert_allclose(w, u, rtol=0, atol=1e-5), sa, sb
        )


SEG = 64


@pytest.fixture(scope="module")
def models_and_vars():
    kw = dict(arch="resnet18", classes=4, dtype=jnp.float32)
    plain = HookNet(**kw)
    packed = HookNet(packed_tail=True, **kw)
    x = jnp.zeros((2, SEG, SEG, 3))
    variables = plain.init(jax.random.key(0), x, x, train=True)
    # Bit-compatible variable trees: the packed model consumes the plain
    # model's params/stats directly.
    chex_tree = jax.tree_util.tree_structure(variables)
    assert jax.tree_util.tree_structure(packed.init(jax.random.key(0), x, x, train=True)) == chex_tree
    return plain, packed, variables


def _batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.normal(size=(B, SEG, SEG, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, SEG, SEG, 3)), jnp.float32)
    return x1, x2


@pytest.mark.slow
class TestPackedFrom2:
    def test_eval_forward_equal_packed_from_2(self):
        """Extending the packed region to block 2 stays exact."""
        kw = dict(arch="resnet18", classes=4, dtype=jnp.float32)
        plain = HookNet(**kw)
        packed = HookNet(packed_tail=True, packed_from=2, **kw)
        x = jnp.zeros((2, SEG, SEG, 3))
        variables = plain.init(jax.random.key(0), x, x, train=True)
        x1, x2 = _batch(seed=9)
        a = jax.jit(lambda v: plain.apply(v, x1, x2, train=False))(variables)
        b = jax.jit(lambda v: packed.apply(v, x1, x2, train=False))(variables)
        for pa, pb in zip(a, b):
            np.testing.assert_allclose(pb, pa, rtol=0, atol=2e-4)


@pytest.mark.slow
class TestPackedDice:
    def test_dice_loss_packed_equals_logical(self):
        from msfwsi_tpu.ops.losses import dice_loss, dice_loss_packed

        rng = np.random.default_rng(0)
        N, H, C = 3, 16, 6
        logits = jnp.asarray(rng.normal(size=(N, H, H, C)), jnp.float32)
        target = jnp.asarray(rng.integers(0, C, size=(N, H, H)))
        packed = s2d.space_to_depth(logits)
        for mask in (None, jnp.asarray([1.0, 0.0, 1.0])):
            a = dice_loss(logits, target, classes=[1, 2, 3], sample_mask=mask)
            b = dice_loss_packed(packed, target, classes=[1, 2, 3], sample_mask=mask)
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)

    def test_packed_logits_train_step_matches(self):
        """finetune_train_step with packed_tail+packed_logits equals the
        plain model's step: loss, metrics, and updated params."""
        from msfwsi_tpu.train import finetune as FT

        kw = dict(arch="resnet18", class_names=("a", "b", "c"), batch_size=2,
                  amp=False, seg_size=SEG, lam=0.75)
        cfg_plain = FT.FinetuneConfig(**kw)
        cfg_packed = FT.FinetuneConfig(packed_tail=True, packed_logits=True, **kw)
        sp = FT.create_finetune_state(jax.random.key(0), cfg_plain, local_batch=2)
        sq = FT.create_finetune_state(jax.random.key(0), cfg_packed, local_batch=2)
        # identical initial variables (trees are bit-compatible)
        sq = sq.replace(params=sp.params, batch_stats=sp.batch_stats,
                        opt_state=sp.opt_state)

        rng = np.random.default_rng(3)
        batch = {
            "context": jnp.asarray(rng.normal(size=(2, SEG, SEG, 3)), jnp.float32),
            "target": jnp.asarray(rng.normal(size=(2, SEG, SEG, 3)), jnp.float32),
            "context_mask": jnp.asarray(rng.integers(0, 4, size=(2, SEG, SEG))),
            "target_mask": jnp.asarray(rng.integers(0, 4, size=(2, SEG, SEG))),
        }
        step_p = FT.make_jitted_finetune_step(cfg_plain, donate=False)
        step_q = FT.make_jitted_finetune_step(cfg_packed, donate=False)
        np_state, np_metrics = step_p(sp, batch)
        nq_state, nq_metrics = step_q(sq, batch)
        np.testing.assert_allclose(
            float(nq_metrics["loss"]), float(np_metrics["loss"]), rtol=0, atol=1e-5
        )
        for k in ("tp", "fp", "fn", "tn"):
            np.testing.assert_array_equal(nq_metrics[k], np_metrics[k])
        pa = jax.tree_util.tree_leaves_with_path(np_state.params)
        pb = dict(jax.tree_util.tree_leaves_with_path(nq_state.params))
        for path, va in pa:
            np.testing.assert_allclose(
                pb[path], va, rtol=0, atol=5e-5,
                err_msg=jax.tree_util.keystr(path),
            )


@pytest.mark.slow
class TestPackedHookNet:
    def test_eval_forward_equal(self, models_and_vars):
        plain, packed, variables = models_and_vars
        x1, x2 = _batch()
        a = jax.jit(lambda v: plain.apply(v, x1, x2, train=False))(variables)
        b = jax.jit(lambda v: packed.apply(v, x1, x2, train=False))(variables)
        for pa, pb in zip(a, b):
            np.testing.assert_allclose(pb, pa, rtol=0, atol=2e-4)

    def test_train_forward_and_stats_equal(self, models_and_vars):
        plain, packed, variables = models_and_vars
        x1, x2 = _batch(seed=1)

        def run(model, v):
            out, upd = model.apply(
                v, x1, x2, train=True, mutable=["batch_stats"]
            )
            return out, upd["batch_stats"]

        (a, sa) = jax.jit(lambda v: run(plain, v))(variables)
        (b, sb) = jax.jit(lambda v: run(packed, v))(variables)
        for pa, pb in zip(a, b):
            np.testing.assert_allclose(pb, pa, rtol=0, atol=2e-4)
        jax.tree_util.tree_map(
            lambda u, w: np.testing.assert_allclose(w, u, rtol=0, atol=1e-5), sa, sb
        )

    def test_param_grads_equal(self, models_and_vars):
        plain, packed, variables = models_and_vars
        x1, x2 = _batch(seed=2)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x1, x2, train=True, mutable=["batch_stats"],
            )
            # weighted sum over both heads so every param gets signal
            return sum(jnp.mean(o * (1.0 + jnp.arange(o.shape[-1]))) for o in out)

        ga = jax.jit(jax.grad(lambda p: loss(plain, p)))(variables["params"])
        gb = jax.jit(jax.grad(lambda p: loss(packed, p)))(variables["params"])
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(v)) for v in jax.tree_util.tree_leaves(ga)))
        )
        for path, va in flat_a:
            vb = np.asarray(flat_b[path])
            va = np.asarray(va)
            # In float64 the packed and plain grads agree to 9e-13 relative
            # (tools/diag/f64_packed_check.py) — the transformation is
            # exact. In fp32, reassociation (different conv-accumulation
            # and BN-stat reduce orders) leaves noise that the deep
            # backward amplifies, and BN-invariance near-cancellations
            # (bias shifts / kernel scalings absorbed by downstream BNs)
            # make some leaf grads tiny relative to that noise — so bound
            # per-leaf error against the global gradient scale too. A
            # structural bug would be O(leaf-norm), far above this.
            # (Observed fp32 noise reaches ~1e-3 of the global norm on the
            # deepest encoder leaves.)
            tol = 1e-3 * np.linalg.norm(va) + 3e-3 * gnorm
            diff = np.linalg.norm(vb - va)
            assert diff < tol, (jax.tree_util.keystr(path), diff, tol)
