"""Loss numerics vs independent torch oracles.

Oracles implement the published algorithms the reference delegates to
(torch.nn.CosineSimilarity; smp DiceLoss multiclass/from_logits) so the JAX
implementations are validated against an independent computation path.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from msfwsi_tpu.ops import losses as L


class TestCosine:
    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(16, 64)).astype(np.float32)
        b = rng.normal(size=(16, 64)).astype(np.float32)
        ours = np.asarray(L.cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
        ref = torch.nn.CosineSimilarity(dim=1)(torch.from_numpy(a), torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_zero_vector_clamped(self):
        a = jnp.zeros((2, 8))
        b = jnp.ones((2, 8))
        out = np.asarray(L.cosine_similarity(a, b))
        ref = torch.nn.CosineSimilarity(dim=1)(torch.zeros(2, 8), torch.ones(2, 8)).numpy()
        np.testing.assert_allclose(out, ref)


class TestSimsiam:
    def test_symmetric_negative_cosine(self):
        rng = np.random.default_rng(1)
        p1, p2, z1, z2 = (rng.normal(size=(8, 32)).astype(np.float32) for _ in range(4))
        ours = float(L.simsiam_loss(*(jnp.asarray(x) for x in (p1, p2, z1, z2))))
        cos = torch.nn.CosineSimilarity(dim=1)
        t = lambda x: torch.from_numpy(x)
        ref = float(-(cos(t(p1), t(z2)).mean() + cos(t(p2), t(z1)).mean()) * 0.5)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_perfect_alignment_is_minus_one(self):
        rng = np.random.default_rng(2)
        p = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        assert float(L.simsiam_loss(p, p, p, p)) == pytest.approx(-1.0, abs=1e-6)

    def test_msfwsi_total_weighting(self):
        # Build synthetic outputs where each scale's loss is exactly -1, so
        # total = 3 * sum(fuser_weights) * (-1).
        rng = np.random.default_rng(3)
        scales = tuple(jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)) for _ in range(4))
        path = (scales, scales, scales, scales)
        outputs = {"context": path, "target": path, "fuser": path}
        w = [0.1, 0.4, 0.7, 1.0]
        total, per_path = L.msfwsi_loss(outputs, w)
        assert float(total) == pytest.approx(-3 * sum(w), rel=1e-5)
        for v in per_path.values():
            assert float(v) == pytest.approx(-sum(w), rel=1e-5)


def smp_dice_loss_oracle(logits_nchw, target, classes):
    """smp.losses.DiceLoss(MULTICLASS_MODE, classes=classes, from_logits=True)
    as published (log_softmax->exp, dims=(0,2), eps=1e-7, absent-class zeroing)."""
    y_pred = logits_nchw.log_softmax(dim=1).exp()
    bs, num_classes = y_pred.shape[:2]
    y_true = target.view(bs, -1)
    y_pred = y_pred.view(bs, num_classes, -1)
    y_true = F.one_hot(y_true, num_classes).permute(0, 2, 1).type_as(y_pred)
    dims = (0, 2)
    intersection = torch.sum(y_pred * y_true, dim=dims)
    cardinality = torch.sum(y_pred + y_true, dim=dims)
    score = (2.0 * intersection) / cardinality.clamp_min(1e-7)
    loss = 1.0 - score
    mask = y_true.sum(dims) > 0
    loss = loss * mask.to(loss.dtype)
    loss = loss[torch.tensor(classes)]
    return loss.mean()


class TestDice:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_smp_semantics(self, seed):
        rng = np.random.default_rng(seed)
        N, H, W, C = 3, 16, 16, 6
        logits = rng.normal(size=(N, H, W, C)).astype(np.float32)
        target = rng.integers(0, C, size=(N, H, W))
        classes = list(range(1, C))
        ours = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target), classes=classes))
        ref = float(
            smp_dice_loss_oracle(
                torch.from_numpy(logits).permute(0, 3, 1, 2).contiguous(),
                torch.from_numpy(target).long(),
                classes,
            )
        )
        assert ours == pytest.approx(ref, rel=1e-5, abs=1e-6)

    def test_absent_class_zeroed(self):
        # Class 2 never appears in the target: its loss term must be 0.
        N, H, W, C = 1, 8, 8, 3
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(N, H, W, C)).astype(np.float32)
        target = np.zeros((N, H, W), np.int32)
        target[0, :4] = 1
        ours = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target), classes=[1, 2]))
        ref = float(
            smp_dice_loss_oracle(
                torch.from_numpy(logits).permute(0, 3, 1, 2).contiguous(),
                torch.from_numpy(target).long(),
                [1, 2],
            )
        )
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_perfect_prediction_near_zero(self):
        target = np.zeros((2, 8, 8), np.int32)
        target[:, 4:] = 1
        logits = np.full((2, 8, 8, 2), -50.0, np.float32)
        logits[..., 0] = np.where(target == 0, 50.0, -50.0)
        logits[..., 1] = np.where(target == 1, 50.0, -50.0)
        val = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target), classes=[1]))
        assert val == pytest.approx(0.0, abs=1e-5)

    def test_sample_mask_equals_unpadded(self):
        """Pad-and-mask parity (drop_last=False under sharding): dice over a
        wrap-padded batch with the padded suffix masked == dice over the
        unpadded partial batch."""
        rng = np.random.default_rng(7)
        N, P, H, W, C = 5, 3, 16, 16, 4  # N real + P padded
        logits = rng.normal(size=(N + P, H, W, C)).astype(np.float32)
        target = rng.integers(0, C, size=(N + P, H, W))
        classes = [1, 2, 3]
        unpadded = float(
            L.dice_loss(jnp.asarray(logits[:N]), jnp.asarray(target[:N]), classes=classes)
        )
        mask = jnp.arange(N + P) < N
        masked = float(
            L.dice_loss(
                jnp.asarray(logits), jnp.asarray(target), classes=classes, sample_mask=mask
            )
        )
        assert masked == pytest.approx(unpadded, rel=1e-6, abs=1e-7)
        # and the mask genuinely matters
        unmasked = float(L.dice_loss(jnp.asarray(logits), jnp.asarray(target), classes=classes))
        assert abs(unmasked - unpadded) > 1e-4

    def test_gradient_flows(self):
        import jax

        rng = np.random.default_rng(5)
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        target = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)))
        g = jax.grad(lambda lg: L.dice_loss(lg, target, classes=[1, 2, 3]))(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestDicePackedVJP:
    """dice_loss_packed's custom VJP vs autodiff of the logical dice_loss
    through depth_to_space — value and gradient must agree (the custom
    backward exists to control HBM materialization, not to change math)."""

    @pytest.mark.parametrize("seed,classes,masked", [
        (0, [1, 2, 3], False),
        (1, None, False),
        (2, [1, 2], True),
    ])
    def test_grad_matches_logical_autodiff(self, seed, classes, masked):
        import jax
        from msfwsi_tpu.ops import s2d

        rng = np.random.default_rng(seed)
        N, H, C = 3, 8, 4
        zp = jnp.asarray(rng.normal(size=(N, H // 2, H // 2, 4 * C)), jnp.float32)
        target = jnp.asarray(rng.integers(0, C, size=(N, H, H)))
        mask = jnp.asarray([1.0, 0.0, 1.0]) if masked else None

        f_packed = lambda z: L.dice_loss_packed(z, target, classes=classes, sample_mask=mask)
        f_logical = lambda z: L.dice_loss(
            s2d.depth_to_space(z), target, classes=classes, sample_mask=mask
        )
        va, ga = jax.value_and_grad(f_packed)(zp)
        vb, gb = jax.value_and_grad(f_logical)(zp)
        np.testing.assert_allclose(float(va), float(vb), rtol=0, atol=1e-6)
        np.testing.assert_allclose(ga, gb, rtol=0, atol=1e-6)

    def test_grad_absent_class_and_bf16(self):
        import jax
        from msfwsi_tpu.ops import s2d

        rng = np.random.default_rng(3)
        N, H, C = 2, 8, 5
        zp32 = jnp.asarray(rng.normal(size=(N, H // 2, H // 2, 4 * C)), jnp.float32)
        target = jnp.asarray(rng.integers(0, 3, size=(N, H, H)))  # classes 3,4 absent
        f = lambda z: L.dice_loss_packed(z, target, classes=[1, 2, 3, 4])
        g32 = jax.grad(f)(zp32)
        glog = jax.grad(lambda z: L.dice_loss(
            s2d.depth_to_space(z), target, classes=[1, 2, 3, 4]))(zp32)
        np.testing.assert_allclose(g32, glog, rtol=0, atol=1e-6)
        # bf16 logits: cotangent comes back bf16, finite, and close to the
        # f32 gradient of the bf16-rounded input.
        zp16 = zp32.astype(jnp.bfloat16)
        g16 = jax.grad(f)(zp16)
        assert g16.dtype == jnp.bfloat16
        ref = jax.grad(f)(zp16.astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(g16, np.float32), np.asarray(ref), rtol=0.05, atol=1e-4
        )
