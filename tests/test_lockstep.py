"""K-step LOCKSTEP training-dynamics parity against the LITERAL reference.

``test_reference_parity.py`` proves forward+loss equality at fixed weights;
this file proves the *training update* matches. The torch side runs the
reference's actual loop — symmetric cosine loss, ``loss.backward()`` through
a (pass-through) GradScaler, ``torch.optim.Adam`` with the three name-keyed
param groups, ``ms_lr`` and sqrt-batch lr scaling
(``/root/reference/tools/ssl_train.py:155,281-309,408-486``) — while our
side runs the production ``make_jitted_train_step``, both from the same
starting weights (carried across by the real checkpoint converters) on
identical fp32 batches.

Assertion design (tolerances are measured values with margin, see each
test): the SimSiam+BN landscape at toy scale amplifies fp32 rounding by
~1e8/step into gradients (ROADMAP.md round-3 note), so the crisp parity
claims are made at STEP 1 — both frameworks update from bit-identical
weights, so any wiring error (wrong group lr, wrong Adam variant, wrong
loss weighting) shows up orders of magnitude above the fp32 noise floor —
and steps 2..k get widening envelopes that bound the chaotic drift without
hiding systematic bias:

  * per-step loss: 1e-5 at step 1 (measured 3.5e-7), 2e-3 envelope after
    (measured <= 5.2e-4 at step 3-4);
  * step-1 Adam magnitude: at t=1 Adam's update is exactly
    ``+-lr * g/(|g| + ~eps)`` elementwise, so ``max |delta param|`` per
    group must equal that group's lr — this pins the sqrt-batch scaling AND
    the per-group ``ms_lr`` multipliers (set deliberately distinct here) to
    <=1e-3 relative, on BOTH frameworks independently;
  * step-1 params: every element's update within 2.01*lr of the
    reference's (the theoretical bound — two opposite full steps), with
    sign disagreements (elements whose gradient is so close to 0 that fp32
    rounding flips its sign between frameworks) bounded at <5e-4 of
    elements (measured 5.3e-5);
  * BN running stats: running-mean equality; running-var trajectories
    differ by EXACTLY the predicted ``n/(n-1)`` Bessel pattern (torch feeds
    ``running_var`` the *unbiased* batch variance, flax the biased one —
    the conscious deviation in docs/PARITY.md, measured here leaf-by-leaf
    with ``n`` taken from live forward hooks on the torch BN modules rather
    than argued from shapes). Both BN updates per step (view1 + view2 pass
    through every module) satisfy
    ``ref_t - m^2*ref_{t-1} = c * (ours_t - m^2*ours_{t-1})`` with
    ``m = 0.9`` and ``c = n/(n-1)`` regardless of the intra-step batch
    values, which is what the trajectory assertion checks per leaf per
    step (step-1 measured tight to 1.4e-7 abs; a >=1/15 relative effect
    for the n<=16 MLP-head leaves, so far above the noise floor).
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

from msfwsi_tpu.train import checkpoint as C  # noqa: E402
from msfwsi_tpu.train.ssl import (  # noqa: E402
    SSLConfig,
    create_ssl_state,
    make_jitted_train_step,
)

B = 4  # context-path BN over B samples: B=2 is degenerate/chaotic
SCALE = 2  # K = 4, n_keep = 2
K = SCALE**2
IMG = 64
STEPS = 4
MS_LR = (1.0, 0.5, 2.0)  # deliberately distinct: exercises the group wiring
LR = 1e-3
FUSER_WEIGHTS = (0.1, 0.4, 0.7, 1.0)
INIT_LR = LR * (B**0.5) / (32**0.5)  # ssl_train.py:155
GROUP_LR = {"context_": INIT_LR * MS_LR[0], "target_": INIT_LR * MS_LR[1], "inter_": INIT_LR * MS_LR[2]}


def _make_batch(rng):
    """One identical fp32 batch in both data contracts. ``shuffle_views=True``
    == the reference contract: target stacks arrive jigsaw-shuffled, ``rev``
    is the inverse permutation (``bcss.py:171-172``)."""
    ctx1 = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    ctx2 = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    tgt1 = rng.normal(size=(B * K, IMG, IMG, 3)).astype(np.float32)
    tgt2 = rng.normal(size=(B * K, IMG, IMG, 3)).astype(np.float32)
    perm1 = np.stack([rng.permutation(K) for _ in range(B)])
    perm2 = np.stack([rng.permutation(K) for _ in range(B)])
    rev1 = np.argsort(perm1, axis=1).astype(np.int32)
    rev2 = np.argsort(perm2, axis=1).astype(np.int32)
    return {
        "context1": ctx1,
        "context2": ctx2,
        "target1": tgt1,
        "target2": tgt2,
        "rev1": rev1,
        "rev2": rev2,
    }


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _ref_loss_from_outputs(outputs):
    """The literal train-loop loss (``ssl_train.py:441-466``)."""
    contrast_loss = torch.nn.CosineSimilarity(dim=1)
    loss = 0
    for path in outputs:
        for i, (p1, p2, z1, z2) in enumerate(zip(*path)):
            loss = loss + (
                -(contrast_loss(p1, z2).mean() + contrast_loss(p2, z1).mean()) * 0.5
            ) * FUSER_WEIGHTS[i]
    return loss


def _build_ref_optimizer(model):
    """Verbatim structure of ``ssl_train.py:281-309``: three name-prefix
    param groups with per-group ``ms_lr`` on the sqrt-batch-scaled lr."""
    context_params = [
        i[1] for i in filter(lambda kv: kv[0].startswith("context_"), model.named_parameters())
    ]
    target_params = [
        i[1] for i in filter(lambda kv: kv[0].startswith("target_"), model.named_parameters())
    ]
    inter_params = [
        i[1] for i in filter(lambda kv: kv[0].startswith("inter_"), model.named_parameters())
    ]
    assert len(context_params) + len(target_params) + len(inter_params) == len(
        list(model.parameters())
    )
    optim_params = [
        {"params": context_params, "lr": GROUP_LR["context_"]},
        {"params": target_params, "lr": GROUP_LR["target_"]},
        {"params": inter_params, "lr": GROUP_LR["inter_"]},
    ]
    return torch.optim.Adam(optim_params, lr=INIT_LR)


def _torch_sd_copy(model):
    return {k: np.array(v.detach().numpy()) for k, v in model.state_dict().items()}


def _our_sd(state):
    return C.flax_msfwsi_to_torch(
        {"params": state.params, "batch_stats": state.batch_stats}, ddp_prefix=False
    )


def _running(sd, leaf):
    return {k: np.asarray(v, np.float32) for k, v in sd.items() if k.endswith(leaf)}


def _params_only(sd):
    return {
        k: np.asarray(v, np.float32)
        for k, v in sd.items()
        if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))
    }


@pytest.mark.slow
class TestSSLLockstep:
    @pytest.fixture(scope="class")
    def run(self):
        torch.manual_seed(0)
        config = SSLConfig(
            arch="resnet18",
            batch_size=B,
            lr=LR,
            scale=SCALE,
            ms_lr=MS_LR,
            fuser_weights=FUSER_WEIGHTS,
            img_size=IMG,
            amp=False,  # fp32 lockstep; the recipes' amp is a dtype knob
            shuffle_views=True,  # the reference data contract
        )
        state = create_ssl_state(jax.random.key(0), config)

        # Same starting weights on the torch side, via the production export.
        sd0 = _our_sd(state)
        sdt = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd0.items()}

        def base_encoder(**kw):
            kw["pretrained"] = False
            return ref_resnet.resnet18(**kw)

        ref_model = ref_backbone.MSFWSI(base_encoder, scale=SCALE, mask_ratio=0.5)
        missing, unexpected = ref_model.load_state_dict(sdt, strict=False)
        assert not unexpected, unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing), missing

        # Live per-module BN reduction counts (numel/C) for the Bessel factor.
        bn_n = {}

        def make_hook(name):
            def hook(mod, inputs, output):
                x = inputs[0]
                n = x.numel() // x.shape[1]
                assert bn_n.setdefault(name, n) == n, name
            return hook

        for name, mod in ref_model.named_modules():
            if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                mod.register_forward_hook(make_hook(name))

        optimizer = _build_ref_optimizer(ref_model)
        scaler = torch.amp.GradScaler("cpu", enabled=False)  # pass-through (amp off)
        jit_step = make_jitted_train_step(config)

        rng = np.random.default_rng(7)
        ref_losses, our_losses = [], []
        ref_var_traj = [_running(sd0, "running_var")]
        our_var_traj = [_running(sd0, "running_var")]
        snapshots = {}

        ref_model.train()
        for t in range(1, STEPS + 1):
            batch = _make_batch(rng)

            outputs = ref_model(
                (_nchw(batch["context1"]), _nchw(batch["target1"])),
                (_nchw(batch["context2"]), _nchw(batch["target2"])),
                (torch.from_numpy(batch["rev1"]).long(), torch.from_numpy(batch["rev2"]).long()),
            )
            loss = _ref_loss_from_outputs(outputs)
            optimizer.zero_grad()
            scaler.scale(loss).backward()
            scaler.step(optimizer)
            scaler.update()
            ref_losses.append(float(loss.item()))

            state, metrics = jit_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
            our_losses.append(float(metrics["loss"]))

            ref_sd_t = _torch_sd_copy(ref_model)
            our_sd_t = _our_sd(state)
            ref_var_traj.append(_running(ref_sd_t, "running_var"))
            our_var_traj.append(_running(our_sd_t, "running_var"))
            if t in (1, STEPS):
                snapshots[t] = (ref_sd_t, our_sd_t)

        return dict(
            sd0=sd0,
            ref_losses=ref_losses,
            our_losses=our_losses,
            ref_var_traj=ref_var_traj,
            our_var_traj=our_var_traj,
            snapshots=snapshots,
            bn_n=bn_n,
        )

    def test_step1_loss(self, run):
        """First loss: identical weights + identical batch -> fp32-tight
        (measured 3.5e-7)."""
        assert run["our_losses"][0] == pytest.approx(run["ref_losses"][0], abs=1e-5)

    def test_loss_lockstep_envelope(self, run):
        """Later steps compound fp32 rounding through the chaotic tiny-batch
        SimSiam+BN landscape; measured drift <=5.2e-4 by step 3-4 — the
        envelope bounds it without hiding a systematic (e.g. lr-scale)
        error, which would exceed it within a step or two."""
        for t, (rl, ol) in enumerate(zip(run["ref_losses"], run["our_losses"]), 1):
            assert ol == pytest.approx(rl, abs=2e-3), (
                f"step {t}: ref {rl} vs ours {ol} "
                f"(full: ref {run['ref_losses']} ours {run['our_losses']})"
            )

    def test_step1_adam_magnitude_pins_group_lrs(self, run):
        """At t=1, Adam's bias-corrected update is +-lr*g/(|g|+~eps) per
        element, so max|delta| over a group == that group's lr. Checked on
        BOTH frameworks independently: pins the sqrt-batch init_lr scaling
        and each ms_lr multiplier to <=1e-3 relative."""
        ref_sd1, our_sd1 = run["snapshots"][1]
        p0 = _params_only(run["sd0"])
        for sd1 in (ref_sd1, our_sd1):
            p1 = _params_only(sd1)
            for prefix, lr_g in GROUP_LR.items():
                dmax = max(
                    np.abs(p1[k] - p0[k]).max() for k in p1 if k.startswith(prefix)
                )
                assert dmax == pytest.approx(lr_g, rel=1e-3), (prefix, dmax, lr_g)

    def test_step1_params(self, run):
        """Element-wise update parity from bit-identical weights. Bound:
        2.01*group_lr (two opposite full Adam steps — attainable only by a
        gradient sign flip); sign flips (fp32-rounding artifacts on
        near-zero gradients) must be rare (<5e-4; measured 5.3e-5)."""
        ref_sd1, our_sd1 = run["snapshots"][1]
        ref_p, our_p = _params_only(ref_sd1), _params_only(our_sd1)
        total = flipped = 0
        for k in our_p:
            prefix = next(p for p in GROUP_LR if k.startswith(p))
            lr_g = GROUP_LR[prefix]
            d = np.abs(our_p[k] - ref_p[k])
            assert d.max() <= 2.01 * lr_g, (k, d.max(), lr_g)
            total += d.size
            flipped += int((d > 0.02 * lr_g).sum())
        assert total > 3e7  # resnet18 x2 + heads: the whole model is covered
        assert flipped / total < 5e-4, (flipped, total)

    def test_running_mean(self, run):
        """running_mean has no Bessel correction: step-1 tight (measured
        2e-5), step-k envelope for the drift (measured up to 3.6e-2 on the
        deepest fuser-head BN — the 2x-lr inter group amplifies fastest)."""
        for t, atol in ((1, 1e-4), (STEPS, 0.1)):
            ref_sd, our_sd = run["snapshots"][t]
            ref_m, our_m = _running(ref_sd, "running_mean"), _running(our_sd, "running_mean")
            for k in our_m:
                np.testing.assert_allclose(
                    our_m[k], ref_m[k], atol=atol, rtol=0, err_msg=f"{k} step {t}"
                )

    def test_running_var_bessel_trajectory(self, run):
        """torch's per-step running_var innovation must equal ours times
        EXACTLY n/(n-1) — flipping the docs/PARITY.md deviation row from
        'argued' to 'measured'. Step 1 is noise-floor tight; step 2 carries
        a drift envelope. Steps 3+ are excluded: by then the chaotic param
        drift moves the batch variances THEMSELVES by up to ~30% relative
        on the deepest fuser-head BNs at this toy scale, so no pattern in
        the innovations is measurable there (the step-k running-mean
        envelope above bounds that drift instead)."""
        bn_n = run["bn_n"]
        m2 = 0.9**2  # two momentum-0.9 updates per step (view1 + view2)
        for t in (1, 2):
            rtol, atol = (5e-3, 1e-6) if t == 1 else (5e-2, 5e-4)
            for key in run["ref_var_traj"][0]:
                mod = key[: -len(".running_var")]
                c = bn_n[mod] / (bn_n[mod] - 1)
                d_ref = run["ref_var_traj"][t][key] - m2 * run["ref_var_traj"][t - 1][key]
                d_our = run["our_var_traj"][t][key] - m2 * run["our_var_traj"][t - 1][key]
                np.testing.assert_allclose(
                    d_ref, c * d_our, rtol=rtol, atol=atol,
                    err_msg=f"{key} step {t} (n={bn_n[mod]}, c={c:.6f})",
                )

    def test_bessel_factor_is_measurable(self, run):
        """The small-n MLP-head BNs (n <= K*B) must VISIBLY violate plain
        equality at step 1 — i.e. the Bessel pattern above is a real
        measured difference, not slack absorbed by tolerances."""
        bn_n = run["bn_n"]
        m2 = 0.9**2
        small = [k for k in run["ref_var_traj"][0]
                 if bn_n[k[: -len(".running_var")]] <= B * K]
        assert small, "expected small-n BN leaves in the MLP heads"
        for key in small:
            n = bn_n[key[: -len(".running_var")]]
            d_ref = run["ref_var_traj"][1][key] - m2 * run["ref_var_traj"][0][key]
            d_our = run["our_var_traj"][1][key] - m2 * run["our_var_traj"][0][key]
            denom = np.maximum(np.abs(d_our), 1e-12)
            rel = np.max(np.abs(d_ref - d_our) / denom)
            # n <= 16 -> c-1 >= 1/15: raw deltas must differ by >= ~half of it
            assert rel > 0.5 / (n - 1), (key, n, rel)


# ---------------------------------------------------------------------------
# Finetune-side lockstep: torch HookNet oracle + Adam vs make_jitted_finetune_step
# ---------------------------------------------------------------------------
#
# smp is not installable in this image, so the torch side is the hand-built
# oracle assembled from the pieces already proven piecewise in
# tests/test_checkpoint.py (pyramid ResNet encoder / smp DecoderBlock /
# segmentation head, weight-transferred by the production converter) and the
# published smp Dice formula from tests/test_losses.py — run through the
# reference's literal finetune update: loss = (1-lam)*Dice(context) +
# lam*Dice(target), loss.backward() via a pass-through GradScaler,
# torch.optim.Adam(model.parameters(), lr*sqrt(B)/sqrt(64))
# (/root/reference/tools/ssl_finetune.py:176-178,287-289,402-474).

import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_checkpoint import TorchDecoderBlock, TorchResNet18  # noqa: E402
from test_losses import smp_dice_loss_oracle  # noqa: E402

from msfwsi_tpu.train import finetune as FT  # noqa: E402

FB = 4
SEG = 64
FSTEPS = 3
FLAM = 0.7  # exercises BOTH dice terms (recipes use the default lam=1)
FLR = 1e-3
F_CLASSES = ("a", "b")  # C = 3 with background
F_INIT_LR = FLR * (FB**0.5) / (64**0.5)  # ssl_finetune.py:176-178


class TorchPyramidResNet18(TorchResNet18):
    """Same parameters as the proven pooled oracle; smp-encoder forward:
    5-level pyramid [relu(bn1(conv1)) /2, layer1 /4, ..., layer4 /32]."""

    def forward(self, x):
        f0 = F.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(f0))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


class TorchUnetBranch(tnn.Module):
    """One HookNet branch: encoder + smp UnetDecoder (+hook export/consume)
    + 3x3 segmentation head, with state_dict keys matching
    ``flax_hooknet_to_torch`` (decoder.blocks.i.convN.{0,1}, head .0)."""

    def __init__(self, classes, context_ch=0, export=False):
        super().__init__()
        self.encoder = TorchPyramidResNet18()
        chans = (256, 128, 64, 32, 16)
        ins = (512 + context_ch, 256, 128, 64, 32)
        skips = (256, 128, 64, 64, 0)
        self.decoder = tnn.Module()
        self.decoder.blocks = tnn.ModuleList(
            [TorchDecoderBlock(i, s, o) for i, s, o in zip(ins, skips, chans)]
        )
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(16, classes, 3, padding=1), tnn.Identity()
        )
        self.export = export

    def forward(self, x, context_feats=None):
        pyramid = self.encoder(x)
        feats = pyramid[::-1]
        x, skips = feats[0], feats[1:]
        if context_feats is not None:
            x = torch.cat([x, context_feats], dim=1)
        exported = None
        for i, block in enumerate(self.decoder.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
            if self.export and i == 1:
                h = x.shape[2]
                c0, c1 = h // 2 - h // 8, h // 2 + h // 8  # 12:20 at 256px
                exported = x[:, :, c0:c1, c0:c1]
        return self.segmentation_head(x), exported


class TorchHookNet(tnn.Module):
    def __init__(self, classes):
        super().__init__()
        self.context_branch = TorchUnetBranch(classes, export=True)
        self.target_branch = TorchUnetBranch(classes, context_ch=128)

    def forward(self, x1, x2):
        context_masks, feats = self.context_branch(x1)
        target_masks, _ = self.target_branch(x2, feats)
        return context_masks, target_masks


def _make_seg_batch(rng):
    ctx = rng.normal(size=(FB, SEG, SEG, 3)).astype(np.float32)
    tgt = rng.normal(size=(FB, SEG, SEG, 3)).astype(np.float32)
    cm = rng.integers(0, len(F_CLASSES) + 1, size=(FB, SEG, SEG)).astype(np.int32)
    tm = rng.integers(0, len(F_CLASSES) + 1, size=(FB, SEG, SEG)).astype(np.int32)
    return {"context": ctx, "target": tgt, "context_mask": cm, "target_mask": tm}


@pytest.mark.slow
class TestFinetuneLockstep:
    @pytest.fixture(scope="class")
    def run(self):
        torch.manual_seed(1)
        config = FT.FinetuneConfig(
            arch="resnet18",
            class_names=F_CLASSES,
            batch_size=FB,
            lr=FLR,
            lam=FLAM,
            seg_size=SEG,
            amp=False,
        )
        state = FT.create_finetune_state(jax.random.key(1), config, local_batch=2)

        sd0 = C.flax_hooknet_to_torch(
            {"params": state.params, "batch_stats": state.batch_stats},
            ddp_prefix=False,
        )
        oracle = TorchHookNet(classes=config.num_classes)
        missing, unexpected = oracle.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd0.items()},
            strict=False,
        )
        assert not unexpected, unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing), missing

        optimizer = torch.optim.Adam(oracle.parameters(), F_INIT_LR)
        scaler = torch.amp.GradScaler("cpu", enabled=False)
        jit_step = FT.make_jitted_finetune_step(config)

        classes = list(range(1, len(F_CLASSES) + 1))
        rng = np.random.default_rng(11)
        ref_losses, our_losses = [], []
        snapshots = {}

        oracle.train()
        for t in range(1, FSTEPS + 1):
            batch = _make_seg_batch(rng)
            ctx_logits, tgt_logits = oracle(
                _nchw(batch["context"]), _nchw(batch["target"])
            )
            loss = (1 - FLAM) * smp_dice_loss_oracle(
                ctx_logits, torch.from_numpy(batch["context_mask"]).long(), classes
            ) + FLAM * smp_dice_loss_oracle(
                tgt_logits, torch.from_numpy(batch["target_mask"]).long(), classes
            )
            optimizer.zero_grad()
            scaler.scale(loss).backward()
            scaler.step(optimizer)
            scaler.update()
            ref_losses.append(float(loss.item()))

            state, metrics = jit_step(
                state, {k: jnp.asarray(v) for k, v in batch.items()}
            )
            our_losses.append(float(metrics["loss"]))
            if t in (1, FSTEPS):
                snapshots[t] = (
                    {k: np.array(v.detach().numpy()) for k, v in oracle.state_dict().items()},
                    C.flax_hooknet_to_torch(
                        {"params": state.params, "batch_stats": state.batch_stats},
                        ddp_prefix=False,
                    ),
                )
        return dict(sd0=sd0, ref_losses=ref_losses, our_losses=our_losses, snapshots=snapshots)

    def test_step1_loss(self, run):
        assert run["our_losses"][0] == pytest.approx(run["ref_losses"][0], abs=1e-5)

    def test_loss_lockstep_envelope(self, run):
        for t, (rl, ol) in enumerate(zip(run["ref_losses"], run["our_losses"]), 1):
            assert ol == pytest.approx(rl, abs=2e-3), (
                f"step {t}: ref {run['ref_losses']} ours {run['our_losses']}"
            )

    def test_step1_adam_magnitude(self, run):
        """Single param group: max|delta| == sqrt-batch-scaled lr at t=1,
        on both frameworks."""
        ref_sd1, our_sd1 = run["snapshots"][1]
        p0 = _params_only(run["sd0"])
        for sd1 in (ref_sd1, our_sd1):
            p1 = _params_only(sd1)
            dmax = max(np.abs(p1[k] - p0[k]).max() for k in p1)
            assert dmax == pytest.approx(F_INIT_LR, rel=1e-3), (dmax, F_INIT_LR)

    def test_step1_params(self, run):
        """Element-wise update parity with the 2*lr sign-flip bound. Flips
        are commoner than the SSL side's 5e-5 (measured: 9.7e-3 context /
        3.0e-3 target branch): soft Dice on random labels is nearly flat,
        so median |grad| is ~1e-5 — fp32 rounding flips the sign of a
        visible fraction of the near-zero elements. The per-element 2*lr
        bound and the step-1 loss/Adam-magnitude assertions carry the
        systematic-error detection; the flip fraction bounds the noise."""
        ref_sd1, our_sd1 = run["snapshots"][1]
        ref_p, our_p = _params_only(ref_sd1), _params_only(our_sd1)
        total = flipped = 0
        for k in our_p:
            d = np.abs(our_p[k] - ref_p[k])
            assert d.max() <= 2.01 * F_INIT_LR, (k, d.max())
            total += d.size
            flipped += int((d > 0.02 * F_INIT_LR).sum())
        assert total > 2.5e7  # two full U-Nets (28.9M params)
        assert flipped / total < 3e-2, (flipped, total)

    def test_post_run_params_and_means(self, run):
        ref_sd, our_sd = run["snapshots"][FSTEPS]
        ref_p, our_p = _params_only(ref_sd), _params_only(our_sd)
        for k in our_p:
            np.testing.assert_allclose(
                our_p[k], ref_p[k], atol=5e-3, rtol=0, err_msg=f"{k} after {FSTEPS} steps"
            )
        ref_m, our_m = _running(ref_sd, "running_mean"), _running(our_sd, "running_mean")
        for k in our_m:
            np.testing.assert_allclose(
                our_m[k], ref_m[k], atol=5e-2, rtol=0, err_msg=f"{k} after {FSTEPS} steps"
            )
