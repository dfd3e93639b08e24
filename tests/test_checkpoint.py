"""Checkpoint interop tests: torch->flax conversion validated by forward
numerics against hand-built torch oracle modules (the published
torchvision/SimSiam/smp layer stacks), plus Orbax round-trips."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from msfwsi_tpu.models import resnet as R
from msfwsi_tpu.models.backbone import Projector, Predictor
from msfwsi_tpu.models.hooknet import DecoderBlock
from msfwsi_tpu.train import checkpoint as C
from msfwsi_tpu.train import ssl as S


# ---------------------------------------------------------------------------
# Torch oracle: torchvision-style resnet18 (BasicBlock), eval mode
# ---------------------------------------------------------------------------


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes)
            )

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        pool = lambda t: t.mean(dim=(2, 3))
        return pool(x1), pool(x2), pool(x3), pool(x4)


def randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


class TestResNetInterop:
    def test_forward_parity_with_torch_oracle(self):
        torch.manual_seed(0)
        oracle = TorchResNet18().eval()
        randomize_bn_stats(oracle)

        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        # torch Sequential names: layer1.0.conv1.weight — converter expects that.
        params, stats = C.torch_resnet_to_flax(sd)

        model = R.get_encoder("resnet18")
        x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
        ours = jax.jit(
            lambda v, x: model.apply(v, x, train=False, features="pooled")
        )({"params": params, "batch_stats": stats}, jnp.asarray(x))

        with torch.no_grad():
            ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)

    def test_converted_tree_matches_init_structure(self):
        torch.manual_seed(1)
        oracle = TorchResNet18()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params, stats = C.torch_resnet_to_flax(sd)

        model = R.get_encoder("resnet18")
        ref_vars = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(0))

        def paths(tree):
            return {
                jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
            }

        assert paths(params) == paths(ref_vars["params"])
        assert paths(stats) == paths(ref_vars["batch_stats"])


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck oracle (optionally grouped, for resnext)."""

    def __init__(self, inplanes, planes, stride=1, groups=1, base_width=64, expansion=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * expansion, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * expansion)
        self.downsample = None
        if stride != 1 or inplanes != planes * expansion:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * expansion, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * expansion),
            )

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TestBottleneckInterop:
    @pytest.mark.parametrize("groups,base_width", [(1, 64), (32, 4)])
    def test_bottleneck_block_parity(self, groups, base_width):
        """Bottleneck (resnet50) and grouped Bottleneck (resnext50_32x4d)
        blocks match the torch oracle after weight conversion."""
        from msfwsi_tpu.models.resnet import Bottleneck

        torch.manual_seed(20 + groups)
        oracle = TorchBottleneck(64, 64, stride=2, groups=groups, base_width=base_width).eval()
        randomize_bn_stats(oracle, seed=21 + groups)

        sd = {f"layer1.0.{k}": v.numpy() for k, v in oracle.state_dict().items()}
        params, stats = C.torch_resnet_to_flax(sd)

        block = Bottleneck(
            planes=64, strides=2, use_projection=True, groups=groups, base_width=base_width
        )
        x = np.random.default_rng(9).normal(size=(2, 16, 16, 64)).astype(np.float32)
        ours = jax.jit(lambda v, xx: block.apply(v, xx, train=False))(
            {"params": params["layer1_0"], "batch_stats": stats["layer1_0"]},
            jnp.asarray(x),
        )
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestMLPInterop:
    def test_projector_parity(self):
        # Reference make_projector (backbone.py:12-22) as torch oracle.
        d, out = 32, 32
        torch.manual_seed(2)
        oracle = tnn.Sequential(
            tnn.Linear(d, d, bias=False), tnn.BatchNorm1d(d), tnn.ReLU(),
            tnn.Linear(d, d, bias=False), tnn.BatchNorm1d(d), tnn.ReLU(),
            tnn.Linear(d, out, bias=False), tnn.BatchNorm1d(out, affine=False),
        ).eval()
        randomize_bn_stats(oracle, seed=3)
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

        params, stats = {}, {}
        C._torch_mlp_to_flax(sd, C._PROJECTOR_SEQ, params, stats, "proj")

        model = Projector(out)
        x = np.random.default_rng(1).normal(size=(4, d)).astype(np.float32)
        ours = model.apply(
            {"params": params["proj"], "batch_stats": stats["proj"]},
            jnp.asarray(x),
            train=False,
        )
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_predictor_parity(self):
        d, hid = 32, 8
        torch.manual_seed(4)
        oracle = tnn.Sequential(
            tnn.Linear(d, hid, bias=False), tnn.BatchNorm1d(hid), tnn.ReLU(),
            tnn.Linear(hid, d),
        ).eval()
        randomize_bn_stats(oracle, seed=5)
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params, stats = {}, {}
        C._torch_mlp_to_flax(sd, C._PREDICTOR_SEQ, params, stats, "pred")

        model = Predictor(hid)
        x = np.random.default_rng(2).normal(size=(4, d)).astype(np.float32)
        ours = model.apply(
            {"params": params["pred"], "batch_stats": stats["pred"]},
            jnp.asarray(x),
            train=False,
        )
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


class TorchDecoderBlock(tnn.Module):
    """smp DecoderBlock oracle: 2x nearest upsample -> concat -> 2x(conv-bn-relu)."""

    def __init__(self, in_ch, skip_ch, out_ch):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(in_ch + skip_ch, out_ch, 3, padding=1, bias=False),
            tnn.BatchNorm2d(out_ch),
            tnn.ReLU(inplace=True),
        )
        self.conv2 = tnn.Sequential(
            tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            tnn.BatchNorm2d(out_ch),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class TestDecoderInterop:
    def test_decoder_block_parity(self):
        torch.manual_seed(6)
        oracle = TorchDecoderBlock(16, 8, 12).eval()
        randomize_bn_stats(oracle, seed=7)
        sd = {f"blocks.0.{k}": v.numpy() for k, v in oracle.state_dict().items()}
        params, stats = {}, {}
        C._torch_unet_decoder_to_flax(sd, params, stats)

        model = DecoderBlock(12)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)
        skip = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        ours = model.apply(
            {"params": params["block0"], "batch_stats": stats["block0"]},
            jnp.asarray(x),
            jnp.asarray(skip),
            train=False,
        )
        with torch.no_grad():
            ref = oracle(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(skip).permute(0, 3, 1, 2),
            ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


class TestReferenceCheckpointFormat:
    def test_msfwsi_pth_tar_to_finetune_surgery(self, tmp_path):
        """Full consume path for a reference-format SSL checkpoint:
        torch.save({'state_dict': DDP 'module.'-prefixed MSFWSI}) ->
        torch_msfwsi_to_flax -> HookNet encoder surgery — with forward
        parity of the grafted encoder against the torch oracle."""
        from msfwsi_tpu.train import finetune as FT

        torch.manual_seed(10)
        ctx_enc = TorchResNet18().eval()
        tgt_enc = TorchResNet18().eval()
        randomize_bn_stats(ctx_enc, seed=11)
        randomize_bn_stats(tgt_enc, seed=12)

        sd = {}
        for prefix, mod in (("context_encoder", ctx_enc), ("target_encoder", tgt_enc)):
            for k, v in mod.state_dict().items():
                sd[f"module.{prefix}.{k}"] = v
        # a projector, as real checkpoints carry them (ignored by surgery)
        proj = torch.nn.Sequential(
            torch.nn.Linear(64, 64, bias=False), torch.nn.BatchNorm1d(64), torch.nn.ReLU(),
            torch.nn.Linear(64, 64, bias=False), torch.nn.BatchNorm1d(64), torch.nn.ReLU(),
            torch.nn.Linear(64, 64, bias=False), torch.nn.BatchNorm1d(64, affine=False),
        )
        for k, v in proj.state_dict().items():
            sd[f"module.context_projector.0.{k}"] = v

        path = tmp_path / "checkpoint_0099.pth.tar"
        torch.save({"epoch": 100, "arch": "resnet18", "state_dict": sd}, path)

        ssl_vars = C.torch_msfwsi_to_flax(C.load_torch_file(str(path)))
        config = FT.FinetuneConfig(arch="resnet18", class_names=("a", "b"), amp=False, seg_size=64)
        state = FT.create_finetune_state(jax.random.key(0), config, local_batch=1)
        state = FT.load_ssl_encoders(state, ssl_vars)

        # Grafted context encoder forward == torch oracle forward.
        x = np.random.default_rng(5).normal(size=(2, 64, 64, 3)).astype(np.float32)
        enc = state.model.bind(
            {"params": state.params, "batch_stats": state.batch_stats}
        ).context_branch.encoder
        ours = jax.jit(lambda xx: enc(xx, train=False, features="pooled"))(jnp.asarray(x))
        with torch.no_grad():
            ref = ctx_enc(torch.from_numpy(x).permute(0, 3, 1, 2))
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)


class TestTorchExport:
    def _trees_equal(self, a, b):
        la = jax.tree_util.tree_flatten_with_path(a)[0]
        lb = jax.tree_util.tree_flatten_with_path(b)[0]
        assert [jax.tree_util.keystr(p) for p, _ in la] == [
            jax.tree_util.keystr(p) for p, _ in lb
        ]
        for (_, x), (_, y) in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_msfwsi_roundtrip(self, tmp_path):
        """flax -> reference .pth.tar -> flax must be the identity."""
        config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, batch_size=4, amp=False)
        state = S.create_ssl_state(jax.random.key(3), config)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        sd = C.flax_msfwsi_to_torch(variables)
        assert all(k.startswith("module.") for k in sd)
        path = str(tmp_path / "exported.pth.tar")
        C.save_torch_file(path, sd, epoch=5)

        back = C.torch_msfwsi_to_flax(C.load_torch_file(path))
        self._trees_equal(back["params"], variables["params"])
        self._trees_equal(back["batch_stats"], variables["batch_stats"])

    def test_hooknet_roundtrip(self, tmp_path):
        from msfwsi_tpu.train import finetune as FT

        config = FT.FinetuneConfig(arch="resnet18", class_names=("a", "b"), amp=False, seg_size=64)
        state = FT.create_finetune_state(jax.random.key(4), config, local_batch=1)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        sd = C.flax_hooknet_to_torch(variables)
        path = str(tmp_path / "hooknet.pth.tar")
        C.save_torch_file(path, sd)

        back = C.torch_hooknet_to_flax(C.load_torch_file(path))
        self._trees_equal(back["params"], variables["params"])
        self._trees_equal(back["batch_stats"], variables["batch_stats"])

    def test_exported_resnet_loads_into_torch_oracle(self):
        """Exported encoder weights must load into a real torch module (the
        reference's load_state_dict consume path) and produce identical
        features."""
        from msfwsi_tpu.models import resnet as R

        model = R.get_encoder("resnet18")
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False)
        )(jax.random.key(5))
        sd = C.flax_resnet_to_torch(variables["params"], variables["batch_stats"])

        oracle = TorchResNet18()
        missing, unexpected = oracle.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=False,
        )
        # only num_batches_tracked buffers may be missing
        assert not unexpected
        assert all("num_batches_tracked" in m for m in missing)
        oracle.eval()

        x = np.random.default_rng(6).normal(size=(2, 64, 64, 3)).astype(np.float32)
        ours = jax.jit(
            lambda v, xx: model.apply(v, xx, train=False, features="pooled")
        )(variables, jnp.asarray(x))
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)


class TestOrbaxRoundtrip:
    def test_ssl_state_roundtrip(self, tmp_path):
        config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, batch_size=8, amp=False)
        state = S.create_ssl_state(jax.random.key(0), config)
        path = C.save_train_state(str(tmp_path), state, epoch=7)
        assert path.endswith("checkpoint_0007")

        # Perturb, then restore.
        perturbed = state.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params),
            step=state.step + 99,
        )
        restored = C.restore_train_state(path, perturbed)
        assert int(restored.step) == 0
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_consecutive_async_saves_isolate_payloads(self, tmp_path):
        """Two back-to-back non-blocking saves of *different* states must
        each persist their own snapshot: save() device_get's the payload
        before queuing, so a later param update (or buffer donation) cannot
        leak into an in-flight earlier save."""
        config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, batch_size=8, amp=False)
        state_a = S.create_ssl_state(jax.random.key(0), config)
        state_b = state_a.replace(
            params=jax.tree_util.tree_map(lambda x: x + 1.0, state_a.params),
            step=state_a.step + 1,
        )
        p_a = C.save_train_state(str(tmp_path), state_a, epoch=1)
        p_b = C.save_train_state(str(tmp_path), state_b, epoch=2)

        r_a = C.restore_train_state(p_a, state_b)  # restore into the "wrong" state
        r_b = C.restore_train_state(p_b, state_a)
        leaf = lambda s: np.asarray(jax.tree_util.tree_leaves(s.params)[0])
        np.testing.assert_array_equal(leaf(r_a), leaf(state_a))
        np.testing.assert_array_equal(leaf(r_b), leaf(state_b))
        assert int(r_a.step) == 0 and int(r_b.step) == 1

    def test_latest_checkpoint(self, tmp_path):
        config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, batch_size=8, amp=False)
        state = S.create_ssl_state(jax.random.key(0), config)
        C.save_train_state(str(tmp_path), state, epoch=3)
        C.save_train_state(str(tmp_path), state, epoch=12)
        latest = C.latest_checkpoint(str(tmp_path))
        assert latest.endswith("checkpoint_0012")
        assert C.latest_checkpoint(str(tmp_path / "nope")) is None


class TestResolveCheckpointArg:
    """Reference recipes pass checkpoint_NNNN.pth.tar names
    (scripts/bcss.sh:24-34); the resolver maps them onto whichever format
    actually exists on disk."""

    def test_existing_path_passthrough(self, tmp_path):
        d = tmp_path / "checkpoint_0001"
        d.mkdir()
        assert C.resolve_checkpoint_arg(str(d)) == str(d)
        f = tmp_path / "w.pth.tar"
        f.write_bytes(b"x")
        assert C.resolve_checkpoint_arg(str(f)) == str(f)

    def test_pth_tar_resolves_to_orbax_dir(self, tmp_path):
        d = tmp_path / "checkpoint_0249"
        d.mkdir()
        assert C.resolve_checkpoint_arg(str(d) + ".pth.tar") == str(d)
        assert C.resolve_checkpoint_arg(str(d) + ".pth") == str(d)

    def test_missing_returns_none(self, tmp_path):
        assert C.resolve_checkpoint_arg(str(tmp_path / "nope.pth.tar")) is None
        assert C.resolve_checkpoint_arg(str(tmp_path / "nope")) is None
