"""MSF-WSI/TPU headline benchmark: SSL pretrain throughput on real hardware.

Measures the full jitted train step (forward + backward + Adam + BN update)
of the flagship dual-branch MSFWSI model on synthetic device-resident data,
and reports **224px tile views processed per second per chip** — each sample
contributes 2 context views + 2*K target tile views (K = scale^2 = 16), i.e.
34 encoder images, matching the reference's per-sample device work
(``tools/ssl_train.py:425-474``).

Baseline (`vs_baseline`): the north-star target of 5,000 tiles/sec/chip
(BASELINE.md — the reference repo publishes no numbers of its own).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

BASELINE_TILES_PER_SEC = 5000.0


def main():
    arch = os.environ.get("BENCH_ARCH", "resnet18")
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msfwsi_tpu.train import ssl as S

    config = S.SSLConfig(arch=arch, scale=4, img_size=224, batch_size=batch, amp=True)
    K = config.scale**2

    rng = np.random.default_rng(0)
    rev = np.stack([rng.permutation(K) for _ in range(batch)])
    Sz = config.img_size
    batch_data = {
        "context1": jnp.asarray(rng.normal(size=(batch, Sz, Sz, 3)), jnp.float32),
        "context2": jnp.asarray(rng.normal(size=(batch, Sz, Sz, 3)), jnp.float32),
        "target1": jnp.asarray(rng.normal(size=(batch * K, Sz, Sz, 3)), jnp.float32),
        "target2": jnp.asarray(rng.normal(size=(batch * K, Sz, Sz, 3)), jnp.float32),
        "rev1": jnp.asarray(np.argsort(rev, axis=1)),
        "rev2": jnp.asarray(np.argsort(rev, axis=1)),
    }

    state = S.create_ssl_state(jax.random.key(0), config)
    step = S.make_jitted_train_step(config, donate=False)

    for _ in range(warmup):
        state, metrics = step(state, batch_data)
    # Force a host read: on some backends (axon tunnel) block_until_ready
    # can return while the pipeline is still one step deep; a scalar
    # device->host transfer is a true sync point.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    n_chips = jax.device_count()
    samples_per_sec = batch * iters / dt
    tiles_per_sec = samples_per_sec * (2 + 2 * K)  # context + target views
    tiles_per_sec_chip = tiles_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": f"ssl_pretrain_tile_views_per_sec_per_chip[{arch},b{batch},scale4,224px]",
                "value": round(tiles_per_sec_chip, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(tiles_per_sec_chip / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
