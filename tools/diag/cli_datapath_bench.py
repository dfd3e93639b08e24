"""Measure the CLI training data path stage by stage.

The headline bench (bench.py) feeds device-resident tiles, so it measures
the on-device aug+train pipeline. The *CLI* path (tools/ssl_train.py) adds
the host stages: PNG decode (native tileio) or packed-cache memmap read,
np.stack, and the host->device transfer. This script times each stage in
isolation plus the assembled loader pipeline, so loader changes are driven
by measurement rather than guesses (the build host for round 3 has ONE CPU
core — decode throughput and GIL contention matter).

Usage:
    python tools/diag/cli_datapath_bench.py [--batch 32] [--iters 8]

Stages reported (seconds per batch of --batch 1024px uint8 tiles):
  decode_native   parallel libpng batch decode (msfwsi_tpu/native)
  pack_read       packed uint8 memmap cache read (data/packed.py)
  h2d_dispatch    jax.device_put call duration (async dispatch cost)
  h2d_sync        device_put + block_until_ready (true transfer time)
  loader_steady   TileBatchLoader steady-state inter-batch interval
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--data", type=str, default="", help="existing prepared dir (else synthesized)")
    ap.add_argument(
        "--d2h",
        action="store_true",
        help="include the D2H stage (pathological through the axon tunnel — a "
        "single np.asarray takes minutes and degrades every measurement after "
        "it, so it is opt-in and must run last/alone)",
    )
    args = ap.parse_args()

    import numpy as np

    from msfwsi_tpu import native
    from msfwsi_tpu.data import loader as L

    B, S = args.batch, args.tile

    # ---- corpus ----------------------------------------------------------
    if args.data:
        root = args.data
        import pandas as pd

        df = pd.read_csv(os.path.join(root, "data.csv"))
        files = df["filename_img"].tolist()[: B * 4]
    else:
        root = tempfile.mkdtemp(prefix="datapath_")
        imgs, _, _ = L.synthetic_tile_library(n_slides=2, tiles_per_slide=B * 2 // 8 + 1, tile_size=S)
        from PIL import Image

        files = []
        for i in range(B * 2):
            p = f"t{i:04d}.png"
            Image.fromarray(imgs[i % len(imgs)]).save(os.path.join(root, p))
            files.append(p)
    paths = [os.path.join(root, f) for f in files[:B]]
    print(f"corpus: {len(files)} tiles of {S}px under {root}", flush=True)

    # ---- stage: native decode -------------------------------------------
    if native.available():
        native.decode_batch(paths, S, S, 3, 8)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            native.decode_batch(paths, S, S, 3, 8)
        t_dec = (time.perf_counter() - t0) / args.iters
        print(f"decode_native: {t_dec:.3f} s/batch ({B * S * S * 3 / t_dec / 1e6:.0f} MB/s raw)", flush=True)
    else:
        print("decode_native: UNAVAILABLE", flush=True)

    # ---- stage: packed cache read ---------------------------------------
    from msfwsi_tpu.data.packed import get_or_build_pack

    pack_prefix = os.path.join(tempfile.gettempdir(), "datapath_pack")
    pack = get_or_build_pack(root, files[: B * 2], pack_prefix)
    batch = np.stack([pack.load(f) for f in files[:B]])  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        batch = np.stack([pack.load(f) for f in files[:B]])
    t_pack = (time.perf_counter() - t0) / args.iters
    print(f"pack_read:     {t_pack:.3f} s/batch", flush=True)

    # ---- stage: H2D ------------------------------------------------------
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    x = jax.device_put(batch)
    x.block_until_ready()
    t0 = time.perf_counter()
    handles = [jax.device_put(batch) for _ in range(args.iters)]
    t_disp = (time.perf_counter() - t0) / args.iters
    for h in handles:
        h.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.device_put(batch).block_until_ready()
    t_sync = (time.perf_counter() - t0) / args.iters
    mb = batch.nbytes / 1e6
    print(f"h2d_dispatch:  {t_disp:.3f} s/batch ({mb:.0f} MB)", flush=True)
    print(f"h2d_sync:      {t_sync:.3f} s/batch ({mb / t_sync:.0f} MB/s)", flush=True)

    # ---- stage: H2D with S parallel streams ------------------------------
    from concurrent.futures import ThreadPoolExecutor

    for streams in (2, 4, 8):
        chunks = np.array_split(batch, streams)
        with ThreadPoolExecutor(streams) as pool:
            list(pool.map(jax.device_put, chunks))  # warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                handles = list(pool.map(jax.device_put, chunks))
                for h in handles:
                    h.block_until_ready()
            t_ms = (time.perf_counter() - t0) / args.iters
        print(
            f"h2d_sync_{streams}str: {t_ms:.3f} s/batch ({mb / t_ms:.0f} MB/s)",
            flush=True,
        )

    # ---- stage: D2H (checkpoint fetch path; opt-in, see --d2h help) ------
    if args.d2h:
        t0 = time.perf_counter()
        np.asarray(x)
        t_d2h = time.perf_counter() - t0
        print(f"d2h_sync:      {t_d2h:.3f} s/batch ({mb / t_d2h:.0f} MB/s)", flush=True)
        # chunked D2H: fetch row-slices concurrently
        for streams in (4, 8):
            idx = np.array_split(np.arange(batch.shape[0]), streams)
            parts = [x[i[0] : i[-1] + 1] for i in idx]
            for p in parts:
                p.block_until_ready()
            with ThreadPoolExecutor(streams) as pool:
                t0 = time.perf_counter()
                list(pool.map(np.asarray, parts))
                t_ms = time.perf_counter() - t0
            print(f"d2h_sync_{streams}str: {t_ms:.3f} s/batch ({mb / t_ms:.0f} MB/s)", flush=True)

    # ---- assembled loader, steady state ---------------------------------
    # Repeat the corpus so one epoch has enough batches for a steady state;
    # the first interval of each epoch (producer spin-up + cold queues) is
    # excluded — it is the per-epoch latency, not the pipeline rate.
    epoch_files = files[: B * 2] * max(3, args.iters // 2)
    for label, kw in [
        ("loader_native", dict()),
        ("loader_packed", dict(load_fn=pack.load, use_native=False)),
    ]:
        dl = L.TileBatchLoader(root, epoch_files, batch_size=B, shuffle=False, seed=0, **kw)
        times, last = [], None
        for b in dl.epoch(0):
            now = time.perf_counter()
            if last is not None:
                times.append(now - last)
            last = now
        times = sorted(times[1:])
        med = times[len(times) // 2]
        print(
            f"{label}: steady inter-batch {med:.3f} s  (min {times[0]:.3f}, "
            f"max {times[-1]:.3f}, n={len(times)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
