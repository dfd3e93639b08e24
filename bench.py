"""MSF-WSI/TPU headline benchmark: end-to-end SSL pretrain throughput.

Measures the full fused jitted pipeline on real hardware — raw uint8 WSI
tiles -> on-device augmentation (2 context views, 2x16 jigsaw target views)
-> dual-branch forward + backward + Adam + BN update — and reports **224px
tile views processed per second per chip**: each sample contributes
2 context + 2*K target views (K = scale^2 = 16), i.e. 34 encoder images,
matching the reference's per-sample device work (``tools/ssl_train.py:425-474``
+ the per-sample albumentations pipelines it runs on CPU).

Baseline (`vs_baseline`): the north-star target of 5,000 tiles/sec/chip
(BASELINE.md — the reference repo publishes no numbers of its own).

Steps are dispatched back-to-back and synced once at the end via a scalar
loss read (a full device->host fetch is pathologically slow through the
axon tunnel and block_until_ready alone under-synchronizes).

Env knobs: BENCH_ARCH, BENCH_BATCH, BENCH_ITERS, BENCH_WARMUP,
BENCH_USE_AC=1 (remat), BENCH_ACCUM=N (gradient accumulation — fits the
published resnet50 b32 on one v5e),
BENCH_INTER_OPT=adam|adafactor (factored fuser-head
optimizer state — required to fit resnet50's ~1.6B-param heads on one v5e),
BENCH_MODE=pipeline|step|hooknet|infer|eval_e2e
  pipeline: default headline (aug + SSL train step, tiles/sec/chip)
  step:     SSL train step only on pre-built views
  hooknet:  HookNet finetune step (aug + Dice fwd/bwd/Adam), 256px pairs/sec
  infer:    HookNet chunked slide inference (eval path), 256px tiles/sec
  eval_e2e: full per-slide validation CLI datapath (host uint8 views,
            slide prefetch, double-buffered uploads), 1024px source
            tiles/sec — BENCH_BATCH = tiles per slide.

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
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    mode = os.environ.get("BENCH_MODE", "pipeline")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.train import ssl as S

    rng = np.random.default_rng(0)

    if mode in ("hooknet", "infer"):
        return hooknet_bench(mode, arch, batch, iters, warmup, rng)
    if mode == "eval_e2e":
        return eval_e2e_bench(arch, batch, iters, warmup, rng)

    config = S.SSLConfig(
        arch=arch,
        scale=4,
        img_size=224,
        batch_size=batch,
        amp=True,
        use_ac=os.environ.get("BENCH_USE_AC", "0") == "1",
        inter_opt=os.environ.get("BENCH_INTER_OPT", "adam"),
        inter_dtype=os.environ.get("BENCH_INTER_DTYPE", "float32"),
        remat_stages=tuple(
            int(s) for s in os.environ.get("BENCH_REMAT_STAGES", "").split(",") if s
        )
        or None,
        accum_steps=int(os.environ.get("BENCH_ACCUM", "1")),
    )
    K = config.scale**2
    state = S.create_ssl_state(jax.random.key(0), config)

    if mode == "pipeline":
        aug_cfg = AugConfig(compute_dtype="bfloat16")
        src = config.scale * aug_cfg.tile_px  # 1024px source tiles
        tiles = jnp.asarray(
            rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8)
        )
        step = S.make_jitted_fused_step(config, aug_cfg, donate=True)
        run = lambda i, st: step(st, tiles, jax.random.fold_in(jax.random.key(1), i))
    else:
        Sz = config.img_size
        rev = np.stack([rng.permutation(K) for _ in range(batch)])
        t1, t2 = S.target_keys(config.shuffle_views)
        batch_data = {
            "context1": jnp.asarray(rng.normal(size=(batch, Sz, Sz, 3)), jnp.float32),
            "context2": jnp.asarray(rng.normal(size=(batch, Sz, Sz, 3)), jnp.float32),
            t1: jnp.asarray(rng.normal(size=(batch * K, Sz, Sz, 3)), jnp.float32),
            t2: jnp.asarray(rng.normal(size=(batch * K, Sz, Sz, 3)), jnp.float32),
            "rev1": jnp.asarray(np.argsort(rev, axis=1)),
            "rev2": jnp.asarray(np.argsort(rev, axis=1)),
        }
        tstep = S.make_jitted_train_step(config, donate=True)
        run = lambda i, st: tstep(st, batch_data)

    for i in range(warmup):
        state, metrics = run(i, state)
    float(metrics["loss"])  # true sync point

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = run(warmup + i, state)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in benchmark"

    n_chips = jax.device_count()
    tiles_per_sec_chip = batch * iters * (2 + 2 * K) / dt / n_chips

    print(
        json.dumps(
            {
                "metric": f"ssl_pretrain_e2e_tile_views_per_sec_per_chip[{arch},b{batch},scale4,224px,{mode}"
                + (",ac" if config.use_ac else "")
                + ("," + config.inter_opt if config.inter_opt != "adam" else "")
                + (",interbf16" if config.inter_dtype == "bfloat16" else "")
                + (
                    f",rs{''.join(map(str, config.remat_stages))}"
                    if config.remat_stages
                    else ""
                )
                + (f",accum{config.accum_steps}" if config.accum_steps > 1 else "")
                + "]",
                "value": round(tiles_per_sec_chip, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(tiles_per_sec_chip / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


def eval_e2e_bench(arch, tiles_per_slide, iters, warmup, rng):
    """Per-slide validation datapath end to end: host uint8 view build
    (cv2, threaded) -> double-buffered chunk uploads -> jitted forward +
    on-device stat accumulation, with slide-level prefetch — the
    `--val-views host` CLI loop on synthetic slides."""
    import jax
    import numpy as np

    from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views_host
    from msfwsi_tpu.train import evaluate as EV
    from msfwsi_tpu.train import finetune as FT
    from msfwsi_tpu.utils import prefetch_iter

    config = FT.FinetuneConfig(arch=arch, class_names=("a", "b", "c", "d", "e"))
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=2)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    cfg = AugConfig()
    C = len(config.class_names)
    stats_fn = EV.make_chunk_stats_hostviews(state.model, C, cfg=cfg)

    # Textured synthetic tissue tiles (not pure random): the axon tunnel
    # compresses transfers, and real H&E tiles compress — pure noise would
    # understate the deployed rate (CLAUDE.md "content-dependent" note).
    from msfwsi_tpu.data.loader import synthetic_tile_library

    T = tiles_per_slide
    imgs_all, masks_all, slide_ids = synthetic_tile_library(
        n_slides=2, tiles_per_slide=T, tile_size=1024, num_classes=C, seed=0
    )
    slides = [
        (imgs_all[slide_ids == s], masks_all[slide_ids == s])
        for s in np.unique(slide_ids)
    ]

    def run_pass(n_slides):
        def views():
            for i in range(n_slides):
                imgs, masks = slides[i % len(slides)]
                yield make_seg_val_views_host(imgs, masks, cfg)

        for ctx_u8, tgt_u8, tmask in prefetch_iter(views()):
            EV.validate_slide_hostviews(
                stats_fn, variables, ctx_u8, tgt_u8, tmask, num_classes=C, chunk=128
            )

    run_pass(warmup)  # compile + warm the transfer path
    t0 = time.perf_counter()
    run_pass(iters)
    dt = time.perf_counter() - t0
    value = T * iters / dt
    print(
        json.dumps(
            {
                "metric": f"eval_cli_e2e_source_tiles_per_sec[{arch},{T}t/slide,hostviews]",
                "value": round(value, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(value / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


def hooknet_bench(mode, arch, batch, iters, warmup, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.train import evaluate as EV
    from msfwsi_tpu.train import finetune as FT

    packed = os.environ.get("BENCH_PACKED_TAIL", "0") == "1"
    config = FT.FinetuneConfig(
        arch=arch, batch_size=batch, amp=True,
        packed_tail=packed, packed_logits=packed and mode == "hooknet",
        packed_from=int(os.environ.get("BENCH_PACKED_FROM", "3")),
    )
    aug_cfg = AugConfig(compute_dtype="bfloat16")
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=2)

    if mode == "hooknet":
        imgs = jnp.asarray(rng.integers(0, 255, size=(batch, 1024, 1024, 3), dtype=np.uint8))
        masks = jnp.asarray(rng.integers(0, config.num_classes, size=(batch, 1024, 1024), dtype=np.uint8))
        step = FT.make_jitted_fused_finetune_step(config, aug_cfg, donate=False)
        st = state
        for i in range(warmup):
            st, metrics = step(st, imgs, masks, jax.random.key(i))
        float(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            st, metrics = step(st, imgs, masks, jax.random.key(100 + i))
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        value = batch * iters / dt / jax.device_count()
        metric = (
            f"hooknet_finetune_pairs_per_sec_per_chip[{arch},b{batch},256px"
            + (",packed" if packed else "")
            + "]"
        )
        base = 0.0
    else:
        chunk = batch
        C = len(config.class_names)  # foreground classes, as in the eval CLIs
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ctx = jnp.asarray(rng.normal(size=(chunk, 256, 256, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(chunk, 256, 256, 3)), jnp.float32)
        masks = jnp.asarray(rng.integers(0, C + 1, size=(chunk, 256, 256)), jnp.int32)
        # Eval path: on-device confusion-stat accumulation (predictions
        # never fetched to the host — see train/evaluate.make_chunk_stats).
        fwd = EV.make_chunk_stats(state.model, C, chunk=chunk)
        acc = jnp.zeros((4, C), jnp.int32)
        for _ in range(warmup):
            acc = fwd(variables, ctx, tgt, masks, acc)
        int(acc[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fwd(variables, ctx, tgt, masks, acc)
        int(acc[0, 0])
        dt = time.perf_counter() - t0
        value = chunk * iters / dt / jax.device_count()
        metric = (
            f"hooknet_inference_tiles_per_sec_per_chip[{arch},chunk{chunk},256px"
            + (",packed" if packed else "")
            + "]"
        )
        base = 0.0

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(value / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
