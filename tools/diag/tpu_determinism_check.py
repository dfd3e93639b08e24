"""Fusion-context reproducibility of the on-device aug pipeline on the
real TPU backend.

Companion to tests/test_augment.py::
test_ssl_views_deterministic_across_fusion_contexts (which runs on
XLA:CPU): builds the same SSL views from the same key (a) in a jit that
returns them directly and (b) inside a jit that also folds the key,
slices the batch, and consumes the views in elementwise comparisons
(so the aug computation is free to fuse into consumers), and reports
the per-key max |deviation|. Anything beyond float-reassociation noise
(~1e-5) means a discrete decision (resampler index, hue sextant)
flipped between duplicated fusion copies — the bug class fixed in
ops/augment.py (matmul resampler default + K-formula hue), observed on
XLA:CPU as O(1) errors on ~6% of pixels.
Run: python tools/diag/tpu_determinism_check.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from msfwsi_tpu.data.pipeline import AugConfig, make_ssl_views


def main():
    print("backend:", jax.default_backend())
    cfg = AugConfig(img_size=224, grid=4, tile_px=256)
    rng = np.random.default_rng(23)
    tiles = jnp.asarray(
        rng.integers(0, 255, size=(4, 1024, 1024, 3), dtype=np.uint8)
    )
    key = jax.random.key(42)
    k0 = jax.random.fold_in(key, 0)

    # (a) views as direct jit outputs (nothing fuses past them).
    direct = jax.jit(lambda k, t: make_ssl_views(k, t, cfg))(k0, tiles[:2])
    direct = jax.tree.map(lambda a: a.astype(jnp.float32), direct)

    # (b) the same views built inside a larger jit — key fold + batch
    # slice upstream, elementwise max-|diff| against (a) downstream, so
    # XLA fuses the aug computation into consumers and may duplicate it.
    @jax.jit
    def fused_dev(k, t, ref):
        v = make_ssl_views(
            jax.random.fold_in(k, 0), jax.lax.slice_in_dim(t, 0, 2, axis=0), cfg
        )
        return {
            kk: jnp.max(jnp.abs(v[kk].astype(jnp.float32) - ref[kk]))
            for kk in ref
        }

    devs = {k: float(v) for k, v in fused_dev(key, tiles, direct).items()}
    worst = 0.0
    for k, d in devs.items():
        worst = max(worst, d)
        print(f"{k}: max|fused - direct| = {d:.3e}")
    print("worst:", worst)
    print("OK" if worst < 1e-4 else "SUSPECT: beyond reassociation noise")


if __name__ == "__main__":
    main()
