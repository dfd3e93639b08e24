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
