"""Shared fixture for the 2-process distributed test: a deterministic SSL
config + global batch both worker processes (and the single-process ground
truth) construct identically."""

import numpy as np

from msfwsi_tpu.train.ssl import SSLConfig

B = 4
SCALE = 2
K = SCALE**2
IMG = 32

CONFIG = SSLConfig(
    arch="resnet18", scale=SCALE, img_size=IMG, batch_size=B, amp=False
)


# 64 is the smallest seg size with a valid context-hook crop geometry
# (block-1 map must be >= 8 px for the center h/4 crop).
SEG = 64

def make_seg_config():
    from msfwsi_tpu.train.finetune import FinetuneConfig

    # packed_tail exercises the space-to-depth decoder across the process
    # mesh (its BN stats reduce over the global batch like everything else).
    return FinetuneConfig(
        arch="resnet18", class_names=("a", "b", "c"), batch_size=B,
        amp=False, seg_size=SEG, packed_tail=True,
    )


def make_seg_global_batch() -> dict:
    rng = np.random.default_rng(7)
    return {
        "context": rng.normal(size=(B, SEG, SEG, 3)).astype(np.float32),
        "target": rng.normal(size=(B, SEG, SEG, 3)).astype(np.float32),
        "context_mask": rng.integers(0, 4, size=(B, SEG, SEG)).astype(np.int32),
        "target_mask": rng.integers(0, 4, size=(B, SEG, SEG)).astype(np.int32),
    }


def make_global_batch() -> dict:
    rng = np.random.default_rng(42)
    mk = lambda n: rng.normal(size=(n, IMG, IMG, 3)).astype(np.float32)
    perm1 = np.stack([rng.permutation(K) for _ in range(B)])
    perm2 = np.stack([rng.permutation(K) for _ in range(B)])
    from msfwsi_tpu.train.ssl import target_keys

    t1, t2 = target_keys(CONFIG.shuffle_views)
    return {
        "context1": mk(B),
        "context2": mk(B),
        t1: mk(B * K),
        t2: mk(B * K),
        "rev1": np.argsort(perm1, axis=1).astype(np.int32),
        "rev2": np.argsort(perm2, axis=1).astype(np.int32),
    }


def make_seg_valid_mask():
    """Global (B,) sample mask with a pad at each process SEGMENT's tail
    (B=4 over 2 processes: [real, pad | real, pad]) — the multi-host
    pad_last pattern, deliberately NOT a global suffix."""
    return np.array([True, False, True, False])
