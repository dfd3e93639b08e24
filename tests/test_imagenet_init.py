"""Default ImageNet encoder bootstrap (reference: pretrained=True always,
``src/models/backbone.py:58-63`` via torch.hub ``src/models/resnet.py:262-275``)."""

import os

import jax
import numpy as np
import pytest
import torch

from msfwsi_tpu.train import checkpoint as C
from msfwsi_tpu.train import ssl as S
from msfwsi_tpu.utils import imagenet as IN

from test_checkpoint import TorchResNet18, randomize_bn_stats


def _fake_torchvision_pth(tmp_path, name="resnet18-f37072fd.pth"):
    torch.manual_seed(7)
    oracle = TorchResNet18()
    randomize_bn_stats(oracle, seed=7)
    path = str(tmp_path / name)
    torch.save(oracle.state_dict(), path)
    return path


class TestResolver:
    def test_explicit_path_wins(self, tmp_path):
        p = _fake_torchvision_pth(tmp_path, "whatever.pth")
        assert IN.resolve_imagenet_weights("resnet18", p) == p

    def test_explicit_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            IN.resolve_imagenet_weights("resnet18", str(tmp_path / "nope.pth"))

    def test_env_dir_hash_name(self, tmp_path, monkeypatch):
        p = _fake_torchvision_pth(tmp_path)  # resnet18-f37072fd.pth
        monkeypatch.setenv("MSFWSI_IMAGENET_DIR", str(tmp_path))
        assert IN.resolve_imagenet_weights("resnet18") == p

    def test_env_dir_bare_name(self, tmp_path, monkeypatch):
        p = _fake_torchvision_pth(tmp_path, "resnet18.pth")
        monkeypatch.setenv("MSFWSI_IMAGENET_DIR", str(tmp_path))
        assert IN.resolve_imagenet_weights("resnet18") == p

    def test_no_cross_arch_match(self, tmp_path, monkeypatch):
        _fake_torchvision_pth(tmp_path, "resnet18-f37072fd.pth")
        monkeypatch.setenv("MSFWSI_IMAGENET_DIR", str(tmp_path))
        monkeypatch.setattr(IN, "_download", lambda arch: None)
        assert IN.resolve_imagenet_weights("resnet50") is None

    def test_not_found_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MSFWSI_IMAGENET_DIR", str(tmp_path))
        monkeypatch.setattr(IN, "_download", lambda arch: None)
        monkeypatch.setattr(
            IN, "search_dirs", lambda: [str(tmp_path)]
        )  # keep real caches out of the test
        assert IN.resolve_imagenet_weights("resnet18") is None

    def test_url_table_covers_factory_archs(self):
        from msfwsi_tpu.models.resnet import ARCH_SPECS

        # Every torchvision-family arch must have its checkpoint URL;
        # archs beyond that family (resnet10, a test/research size) have
        # none by design and must resolve to None (random init) instead
        # of crashing the bootstrap.
        extra = set(ARCH_SPECS) - set(IN.MODEL_URLS)
        assert extra == {"resnet10"}
        assert set(IN.MODEL_URLS) <= set(ARCH_SPECS)
        assert IN.resolve_imagenet_weights("resnet10") is None


class TestEncoderInit:
    def test_encoders_differ_from_random_init(self, tmp_path):
        p = _fake_torchvision_pth(tmp_path)
        config = S.SSLConfig(arch="resnet18", scale=2, img_size=32, batch_size=2, amp=False)
        state = S.create_ssl_state(jax.random.key(0), config)
        loaded = S.load_imagenet_encoders(state, C.load_torch_file(p))

        before = state.params["context_encoder"]
        after = loaded.params["context_encoder"]
        changed = jax.tree.map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), before, after
        )
        assert any(jax.tree.leaves(changed)), "encoder params unchanged by ImageNet init"
        # Both branches get the same weights (reference: two pretrained copies).
        ctx, tgt = loaded.params["context_encoder"], loaded.params["target_encoder"]
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), ctx, tgt
        )
        assert all(jax.tree.leaves(same))
        # Heads keep their random init.
        h0, h1 = state.params["inter_projector_0"], loaded.params["inter_projector_0"]
        same_heads = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), h0, h1
        )
        assert all(jax.tree.leaves(same_heads))
