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
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

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
