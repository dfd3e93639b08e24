"""Metric stack vs an independent torch.histc-based oracle implementing the
published smp.metrics algorithm (get_stats multiclass + ignore_index, and the
micro / micro-imagewise / per-class reductions used at
``tools/evaluate.py:283-310``)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from msfwsi_tpu.ops import metrics as M


def smp_get_stats_oracle(output, target, num_classes, ignore_index=None):
    """Published smp _get_stats_multiclass algorithm (histc per sample)."""
    output = output.clone()
    target = target.clone()
    batch_size = output.shape[0]
    output = output.view(batch_size, -1)
    target = target.view(batch_size, -1)
    num_elements = output.shape[1]

    if ignore_index is not None:
        ignore = target == ignore_index
        output = torch.where(ignore, torch.tensor(ignore_index), output)
        ignore_per_sample = ignore.view(batch_size, -1).sum(1)

    tp_count = torch.zeros(batch_size, num_classes, dtype=torch.long)
    fp_count = torch.zeros(batch_size, num_classes, dtype=torch.long)
    fn_count = torch.zeros(batch_size, num_classes, dtype=torch.long)
    tn_count = torch.zeros(batch_size, num_classes, dtype=torch.long)
    for i in range(batch_size):
        target_i = target[i]
        output_i = output[i]
        mask = output_i == target_i
        matched = torch.where(mask, target_i, torch.tensor(-1))
        tp = torch.histc(matched.float(), bins=num_classes, min=0, max=num_classes - 1)
        fp = torch.histc(output_i.float(), bins=num_classes, min=0, max=num_classes - 1) - tp
        fn = torch.histc(target_i.float(), bins=num_classes, min=0, max=num_classes - 1) - tp
        tn = num_elements - tp - fp - fn
        if ignore_index is not None:
            tn = tn - ignore_per_sample[i]
        tp_count[i], fp_count[i], fn_count[i], tn_count[i] = (
            tp.long(),
            fp.long(),
            fn.long(),
            tn.long(),
        )
    return tp_count, fp_count, fn_count, tn_count


def _random_case(seed, N=4, H=16, W=16, C=5, with_ignore=True):
    rng = np.random.default_rng(seed)
    # Mirror the reference's usage: classes 0..C plus background, then -1 shift.
    pred = rng.integers(0, C + 1, size=(N, H, W)).astype(np.int64) - 1
    tgt = rng.integers(0, C + 1, size=(N, H, W)).astype(np.int64) - 1
    if not with_ignore:
        tgt = np.abs(tgt)
    return pred, tgt


class TestGetStats:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("with_ignore", [True, False])
    def test_matches_oracle(self, seed, with_ignore):
        pred, tgt = _random_case(seed, with_ignore=with_ignore)
        C = 5
        ours = M.get_stats(jnp.asarray(pred), jnp.asarray(tgt), num_classes=C, ignore_index=-1)
        ref = smp_get_stats_oracle(
            torch.from_numpy(pred), torch.from_numpy(tgt), num_classes=C, ignore_index=-1
        )
        for o, r in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(o), r.numpy())

    def test_counts_add_up(self):
        pred, tgt = _random_case(3)
        tp, fp, fn, tn = M.get_stats(jnp.asarray(pred), jnp.asarray(tgt), 5, ignore_index=-1)
        n_valid = (tgt != -1).reshape(4, -1).sum(1)
        # For each class: tp+fp+fn+tn == valid pixel count.
        total = np.asarray(tp + fp + fn + tn)
        np.testing.assert_array_equal(total, np.tile(n_valid[:, None], (1, 5)))


def _scores_oracle(tp, fp, fn, tn, metric, reduction):
    tp, fp, fn, tn = (x.float() for x in (tp, fp, fn, tn))

    def compute(tp, fp, fn, tn):
        if metric == "f1":
            return 2 * tp / (2 * tp + fp + fn)
        if metric == "iou":
            return tp / (tp + fp + fn)
        return (tp + tn) / (tp + fp + fn + tn)

    if reduction == "micro":
        x = compute(tp.sum(), fp.sum(), fn.sum(), tn.sum())
    elif reduction == "micro-imagewise":
        x = compute(tp.sum(1), fp.sum(1), fn.sum(1), tn.sum(1))
        x = torch.nan_to_num(x, nan=0.0).mean()
        return x
    elif reduction is None:
        x = compute(tp, fp, fn, tn)
    return torch.nan_to_num(x, nan=0.0)


class TestScores:
    @pytest.mark.parametrize("metric", ["f1", "iou", "accuracy"])
    @pytest.mark.parametrize("reduction", ["micro", "micro-imagewise", None])
    def test_matches_oracle(self, metric, reduction):
        pred, tgt = _random_case(7)
        tp, fp, fn, tn = smp_get_stats_oracle(
            torch.from_numpy(pred), torch.from_numpy(tgt), 5, ignore_index=-1
        )
        fn_map = {"f1": M.f1_score, "iou": M.iou_score, "accuracy": M.accuracy}
        ours = fn_map[metric](
            jnp.asarray(tp.numpy()),
            jnp.asarray(fp.numpy()),
            jnp.asarray(fn.numpy()),
            jnp.asarray(tn.numpy()),
            reduction=reduction,
        )
        ref = _scores_oracle(tp, fp, fn, tn, metric, reduction)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6, atol=1e-7)

    def test_zero_division_to_zero(self):
        # A class with no predictions and no targets: f1 = 0/0 -> 0.
        tp = jnp.zeros((1, 3), jnp.int32)
        fp = jnp.zeros((1, 3), jnp.int32)
        fn = jnp.zeros((1, 3), jnp.int32)
        tn = jnp.full((1, 3), 10, jnp.int32)
        out = np.asarray(M.f1_score(tp, fp, fn, tn, reduction=None))
        np.testing.assert_array_equal(out, np.zeros((1, 3), np.float32))
        # accuracy still well-defined
        acc = np.asarray(M.accuracy(tp, fp, fn, tn, reduction=None))
        np.testing.assert_allclose(acc, np.ones((1, 3), np.float32))

    def test_perfect_prediction(self):
        pred = np.array([[0, 1, 2, 2]])
        tgt = np.array([[0, 1, 2, 2]])
        tp, fp, fn, tn = M.get_stats(jnp.asarray(pred), jnp.asarray(tgt), 3)
        assert float(M.f1_score(tp, fp, fn, tn, reduction="micro")) == 1.0
        assert float(M.iou_score(tp, fp, fn, tn, reduction="micro")) == 1.0
        assert float(M.accuracy(tp, fp, fn, tn, reduction="micro")) == 1.0
