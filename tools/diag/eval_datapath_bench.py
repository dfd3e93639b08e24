"""Measure the CLI validation datapath: view building + host round trips.

The CLI eval loop (tools/evaluate.py:114-121, ssl_finetune run_validation)
does, per slide:
  1. H2D: uint8 slide tiles -> device (implicit, via make_seg_val_views)
  2. make_seg_val_views: eager jnp ops -> f32 device views
  3. np.asarray(views): full f32 D2H  <-- suspected pathological on axon
  4. _pad_to_multiple + per-chunk H2D back into stats_fn

This times each leg for a realistic slide (T tiles of 1024px) so the
device-resident restructure is driven by measurement.

Usage: python tools/diag/eval_datapath_bench.py [--tiles 96] [--chunk 128]
       python tools/diag/eval_datapath_bench.py --e2e   # old vs u8 validate_slide
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def e2e(args):
    """Time per-slide validation: eager-views + validate_slide (old CLI path)
    vs make_chunk_stats_u8 + validate_slide_u8 (device-resident)."""
    import numpy as np

    import jax

    from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views
    from msfwsi_tpu.train import evaluate as EV
    from msfwsi_tpu.train import finetune as FT

    config = FT.FinetuneConfig(arch="resnet18", class_names=("a", "b", "c", "d", "e"))
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=2)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    T = args.tiles
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (T, 1024, 1024, 3), np.uint8)
    masks = rng.integers(0, 6, (T, 1024, 1024), np.uint8)
    cfg = AugConfig()

    f_u8 = EV.make_chunk_stats_u8(state.model, 5, cfg=cfg)
    f_host = EV.make_chunk_stats_hostviews(state.model, 5, cfg=cfg)
    f_old = EV.make_chunk_stats(state.model, 5, chunk=args.chunk)

    def run_new():
        return EV.validate_slide_u8(
            f_u8, variables, imgs, masks, num_classes=5, chunk=args.chunk
        )

    def run_host():
        from msfwsi_tpu.data.pipeline import make_seg_val_views_host

        ctx_u8, tgt_u8, tmask = make_seg_val_views_host(imgs, masks, cfg)
        return EV.validate_slide_hostviews(
            f_host, variables, ctx_u8, tgt_u8, tmask, num_classes=5, chunk=args.chunk
        )

    def run_old():
        (ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, cfg)
        return EV.validate_slide(
            f_old, variables, np.asarray(ctx), np.asarray(tgt), np.asarray(tmask),
            num_classes=5, chunk=args.chunk,
        )

    for name, fn in [
        ("hostviews_u8", run_host),
        ("u8_device_resident", run_new),
        ("old_eager_roundtrip", run_old),
    ]:
        m, _ = fn()  # warm/compile
        t0 = time.perf_counter()
        m, _ = fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f} s/slide ({T / dt:.0f} tiles/s) f1={m['f1']:.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--e2e", action="store_true")
    args = ap.parse_args()
    if args.e2e:
        return e2e(args)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views

    T = args.tiles
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (T, 1024, 1024, 3), np.uint8)
    masks = rng.integers(0, 6, (T, 1024, 1024), np.uint8)
    cfg = AugConfig()
    print(f"slide: {T} tiles of 1024px ({imgs.nbytes / 1e6:.0f} MB uint8)", flush=True)

    def sync(x):
        return float(jnp.sum(x[..., 0, 0, 0].astype(jnp.float32)))

    # leg 2: eager view build (includes the uint8 H2D)
    (ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, cfg)  # warm
    sync(ctx)
    t0 = time.perf_counter()
    (ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, cfg)
    sync(ctx), sync(tgt)
    t_views = time.perf_counter() - t0
    mb = ctx.nbytes / 1e6
    print(f"views_build:   {t_views:.3f} s (ctx {mb:.0f} MB f32 on device)", flush=True)

    # leg 3a: np.asarray D2H (the current CLI path)
    t0 = time.perf_counter()
    ctx_h = np.asarray(ctx)
    t_np = time.perf_counter() - t0
    print(f"d2h_np_asarray: {t_np:.3f} s ({mb / t_np:.0f} MB/s)", flush=True)

    # leg 3b: jax.device_get (pipelined copy_to_host_async)
    t0 = time.perf_counter()
    tgt_h = jax.device_get(tgt)
    t_dg = time.perf_counter() - t0
    print(f"d2h_device_get: {t_dg:.3f} s ({mb / t_dg:.0f} MB/s)", flush=True)

    # leg 4: per-chunk H2D re-upload of the host views
    nchunks = max(1, (T + args.chunk - 1) // args.chunk)
    t0 = time.perf_counter()
    for i in range(0, T, args.chunk):
        jax.device_put(ctx_h[i : i + args.chunk]).block_until_ready()
    t_h2d = time.perf_counter() - t0
    print(f"h2d_chunks:    {t_h2d:.3f} s ({nchunks} chunks)", flush=True)

    # device-resident alternative: pad + slice on device, no round trip
    def dev_pad_slice(c):
        pad = (-c.shape[0]) % args.chunk
        c = jnp.pad(c, ((0, pad), (0, 0), (0, 0), (0, 0)))
        outs = [c[i : i + args.chunk] for i in range(0, c.shape[0], args.chunk)]
        return outs

    outs = dev_pad_slice(ctx)
    sync(outs[-1])
    t0 = time.perf_counter()
    outs = dev_pad_slice(ctx)
    sync(outs[-1])
    t_dev = time.perf_counter() - t0
    print(f"device_pad_slice: {t_dev:.3f} s (no host round trip)", flush=True)


if __name__ == "__main__":
    main()
