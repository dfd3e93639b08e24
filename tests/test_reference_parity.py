"""Direct numeric parity against the LITERAL reference code.

Unlike the oracle tests (which re-implement torch semantics by hand), these
import ``/root/reference``'s actual model code (torch CPU) and assert our
Flax MSFWSI matches it forward-for-forward on identical inputs, with weights
carried across by the real checkpoint converters in BOTH directions:

  * Flax random init -> ``flax_msfwsi_to_torch`` -> reference
    ``src.models.backbone.MSFWSI`` (``backbone.py:129-222``);
  * reference random init -> ``torch.save`` -> ``load_torch_file`` ->
    ``torch_msfwsi_to_flax`` -> our model.

Covered: (i) the 4-stage pooled encoder features (``resnet.py:244-256``),
(ii) all 12 projector/predictor stacks via the full 3-path output pytree,
(iii) the 3-path fuser-weighted total loss (``ssl_train.py:448-466``),
in both eval (running stats) and train (batch stats) BN modes, and both
view contracts (reference shuffled stacks / feature-level-jigsaw fast path).

Known conscious deviation NOT asserted here: torch updates BN *running* var
with the unbiased (Bessel) estimator while flax/our BN stores the biased
batch var — normalization itself uses biased var in both frameworks, so
forward outputs match; only the running-stat trajectories differ by
n/(n-1) per step (documented in docs/PARITY.md).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from src.models import backbone as ref_backbone  # noqa: E402
from src.models import resnet as ref_resnet  # noqa: E402

from msfwsi_tpu.models.backbone import MSFWSI  # noqa: E402
from msfwsi_tpu.ops.losses import msfwsi_loss  # noqa: E402
from msfwsi_tpu.train import checkpoint as C  # noqa: E402

B = 4  # context-path BN over B samples: B=2 is degenerate/chaotic
SCALE = 2  # K = 4, n_keep = 2
K = SCALE**2
IMG = 64
FUSER_WEIGHTS = (0.1, 0.4, 0.7, 1.0)


def _base_encoder(**kw):
    """Reference ``base_encoder`` partial with the hardcoded
    ``pretrained=True`` (``backbone.py:58-63``) forced off — no network in
    this image, and parity wants controlled random weights anyway."""
    kw["pretrained"] = False
    return ref_resnet.resnet18(**kw)


def _build_ref_model(seed: int = 0) -> torch.nn.Module:
    torch.manual_seed(seed)
    model = ref_backbone.MSFWSI(_base_encoder, scale=SCALE, mask_ratio=0.5)
    model.eval()
    return model


def _make_inputs(seed: int = 0):
    rng = np.random.default_rng(seed)
    ctx1 = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    ctx2 = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    tgt1 = rng.normal(size=(B * K, IMG, IMG, 3)).astype(np.float32)
    tgt2 = rng.normal(size=(B * K, IMG, IMG, 3)).astype(np.float32)
    # Per-sample inverse jigsaw permutations, as the datasets emit them
    # (bcss.py:171-172): rev = argsort(perm).
    perm1 = np.stack([rng.permutation(K) for _ in range(B)])
    perm2 = np.stack([rng.permutation(K) for _ in range(B)])
    rev1 = np.argsort(perm1, axis=1)
    rev2 = np.argsort(perm2, axis=1)
    return ctx1, ctx2, tgt1, tgt2, rev1, rev2


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()


def _ref_forward(ref_model, inputs, train: bool):
    ctx1, ctx2, tgt1, tgt2, rev1, rev2 = inputs
    ref_model.train(train)
    with torch.no_grad():
        out = ref_model(
            (_nchw(ctx1), _nchw(tgt1)),
            (_nchw(ctx2), _nchw(tgt2)),
            (torch.from_numpy(rev1), torch.from_numpy(rev2)),
        )
    ref_model.eval()
    return out


def _ref_loss(ref_out) -> float:
    """The reference train loop's loss (``ssl_train.py:441-466``)."""
    cos = torch.nn.CosineSimilarity(dim=1)
    total = 0.0
    for path in ref_out:
        for i, (p1, p2, z1, z2) in enumerate(zip(*path)):
            total += (
                -(cos(p1, z2).mean() + cos(p2, z1).mean()) * 0.5
            ) * FUSER_WEIGHTS[i]
    return float(total)


def _load_ref_from_flax(flax_model, variables) -> torch.nn.Module:
    """Export our weights and load them into the literal reference class."""
    sd = C.flax_msfwsi_to_torch(variables)  # "module."-prefixed, as saved
    sd = {k[len("module."):]: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    ref_model = _build_ref_model()
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    # The exporter intentionally omits only torch's step counters.
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    return ref_model


def _flax_forward(model, variables, inputs, train: bool):
    ctx1, ctx2, tgt1, tgt2, rev1, rev2 = inputs

    @jax.jit
    def run(vs):
        return model.apply(
            vs,
            (jnp.asarray(ctx1), jnp.asarray(tgt1)),
            (jnp.asarray(ctx2), jnp.asarray(tgt2)),
            (jnp.asarray(rev1), jnp.asarray(rev2)),
            train=train,
            **({"mutable": ["batch_stats"]} if train else {}),
        )

    out = run(variables)
    return out[0] if train else out


def _assert_outputs_match(ref_out, flax_out, atol=5e-4, rtol=5e-4):
    """Compare the full 3-path x (p1,p2,z1,z2) x 4-scale output pytree —
    this exercises all 12 projector and all 12 predictor stacks."""
    for path_idx, path_name in enumerate(("context", "target", "fuser")):
        ref_path = ref_out[path_idx]
        flax_path = flax_out[path_name]
        for t_idx, t_name in enumerate(("p1", "p2", "z1", "z2")):
            for s in range(4):
                ref_arr = ref_path[t_idx][s].detach().numpy()
                got = np.asarray(flax_path[t_idx][s], dtype=np.float32)
                np.testing.assert_allclose(
                    got, ref_arr, atol=atol, rtol=rtol,
                    err_msg=f"{path_name}.{t_name}[scale {s}]",
                )


@pytest.fixture(scope="module")
def flax_side():
    model = MSFWSI(arch="resnet18", scale=SCALE, mask_ratio=0.5, dtype=jnp.float32)
    inputs = _make_inputs(0)
    ctx1, _, tgt1, _, rev1, rev2 = inputs
    variables = model.init(
        jax.random.key(0),
        (jnp.asarray(ctx1), jnp.asarray(tgt1)),
        (jnp.asarray(ctx1), jnp.asarray(tgt1)),
        (jnp.asarray(rev1), jnp.asarray(rev2)),
        train=False,
    )
    # Non-trivial running stats so eval mode actually tests their transport.
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze-safe copy
    return model, variables, inputs


@pytest.mark.slow
class TestFlaxToTorch:
    """Our random init -> flax_msfwsi_to_torch -> literal reference model."""

    def test_encoder_pooled_features(self, flax_side):
        model, variables, inputs = flax_side
        ref_model = _load_ref_from_flax(model, variables)
        ctx1 = inputs[0]
        with torch.no_grad():
            ref_feats = ref_model.context_encoder(_nchw(ctx1))
        flax_feats = model.apply(
            variables, jnp.asarray(ctx1), train=False, method=MSFWSI.encode_context
        )
        assert len(ref_feats) == len(flax_feats) == 4
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(flax_feats[s], np.float32),
                ref_feats[s].numpy(),
                atol=2e-4, rtol=2e-4,
                err_msg=f"pooled stage {s}",
            )

    def test_forward_and_loss_eval_mode(self, flax_side):
        model, variables, inputs = flax_side
        ref_model = _load_ref_from_flax(model, variables)
        ref_out = _ref_forward(ref_model, inputs, train=False)
        flax_out = _flax_forward(model, variables, inputs, train=False)
        _assert_outputs_match(ref_out, flax_out)
        total, _ = msfwsi_loss(flax_out, FUSER_WEIGHTS)
        assert float(total) == pytest.approx(_ref_loss(ref_out), abs=2e-5)

    def test_forward_and_loss_train_mode(self, flax_side):
        """Batch-statistic BN mode — the mode the training loss runs in."""
        model, variables, inputs = flax_side
        ref_model = _load_ref_from_flax(model, variables)
        ref_out = _ref_forward(ref_model, inputs, train=True)
        flax_out = _flax_forward(model, variables, inputs, train=True)
        # Batch-stat BN over tiny batches amplifies fp32 rounding through the
        # 20+-layer stack; absolute-only tolerance (rtol blows up near 0).
        _assert_outputs_match(ref_out, flax_out, atol=2e-2, rtol=0)
        total, _ = msfwsi_loss(flax_out, FUSER_WEIGHTS)
        assert float(total) == pytest.approx(_ref_loss(ref_out), abs=2e-4)

    def test_fast_path_views_match_reference_shuffled_views(self, flax_side):
        """views_shuffled=False consumes SPATIAL view stacks and applies the
        jigsaw at the feature level; the reference consumes SHUFFLED stacks
        and un-shuffles features. For the same permutation both must produce
        identical outputs (the encoder is per-tile; backbone.py:147-158,193-202).
        """
        model, variables, inputs = flax_side
        ctx1, ctx2, tgt1, tgt2, rev1, rev2 = inputs
        ref_model = _load_ref_from_flax(model, variables)

        # Build the shuffled stacks the reference contract expects:
        # shuffled[b*K + j] = spatial[b*K + perm[b, j]], rev = argsort(perm).
        perm1 = np.argsort(rev1, axis=1)
        perm2 = np.argsort(rev2, axis=1)
        def shuffle(t, perm):
            t = t.reshape(B, K, IMG, IMG, 3)
            out = np.take_along_axis(t, perm[:, :, None, None, None], axis=1)
            return out.reshape(B * K, IMG, IMG, 3)

        ref_inputs = (ctx1, ctx2, shuffle(tgt1, perm1), shuffle(tgt2, perm2), rev1, rev2)
        ref_out = _ref_forward(ref_model, ref_inputs, train=False)

        fast_model = MSFWSI(
            arch="resnet18", scale=SCALE, mask_ratio=0.5,
            dtype=jnp.float32, views_shuffled=False,
        )
        flax_out = _flax_forward(fast_model, variables, inputs, train=False)
        _assert_outputs_match(ref_out, flax_out)


@pytest.mark.slow
class TestTorchToFlax:
    """Literal reference random init -> .pth.tar on disk -> load_torch_file
    -> torch_msfwsi_to_flax -> our model (the released-weights path)."""

    def test_forward_and_loss_both_modes(self, tmp_path, flax_side):
        model, variables, inputs = flax_side
        ref_model = _build_ref_model(seed=123)
        path = str(tmp_path / "checkpoint_0000.pth.tar")
        # Saved exactly as the reference writes it (ssl_train.py:376-387):
        # DDP "module."-prefixed state_dict inside a payload dict.
        torch.save(
            {
                "epoch": 1,
                "arch": "resnet18",
                "state_dict": {
                    f"module.{k}": v for k, v in ref_model.state_dict().items()
                },
            },
            path,
        )
        converted = C.torch_msfwsi_to_flax(C.load_torch_file(path))
        # Same tree structure as a native init (so optimizers accept it).
        assert jax.tree_util.tree_structure(
            converted["params"]
        ) == jax.tree_util.tree_structure(dict(variables["params"]))

        for train in (False, True):
            ref_out = _ref_forward(ref_model, inputs, train=train)
            flax_out = _flax_forward(model, converted, inputs, train=train)
            _assert_outputs_match(
                ref_out, flax_out,
                atol=2e-2 if train else 5e-4, rtol=0 if train else 5e-4,
            )
            total, _ = msfwsi_loss(flax_out, FUSER_WEIGHTS)
            assert float(total) == pytest.approx(
                _ref_loss(ref_out), abs=2e-4 if train else 2e-5
            )
