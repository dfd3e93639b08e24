"""Instrument the TileBatchLoader pipeline stage timings on the real device.

cli_datapath_bench showed steady inter-batch ~1.8 s while the isolated
stages sum to ~0.6 s (decode 0.55 + H2D 0.07). This traces the actual
per-batch wall time spent in (a) the decode call inside the producer
thread, (b) the device_put inside the transfer thread, and (c) the
consumer's q_dev.get() wait, to find where the pipeline serializes.

Usage: python tools/diag/loader_trace.py [--batch 32] [--nbatches 8]
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
    ap.add_argument("--nbatches", type=int, default=8)
    ap.add_argument("--tile", type=int, default=1024)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from msfwsi_tpu.data import loader as L

    B, S = args.batch, args.tile
    root = tempfile.mkdtemp(prefix="ldtrace_")
    imgs, _, _ = L.synthetic_tile_library(n_slides=2, tiles_per_slide=B // 4 + 1, tile_size=S)
    files = []
    for i in range(B * 2):
        p = f"t{i:04d}.png"
        Image.fromarray(imgs[i % len(imgs)]).save(os.path.join(root, p))
        files.append(p)
    epoch_files = files * max(1, (args.nbatches * B) // len(files) + 1)

    dl = L.TileBatchLoader(root, epoch_files, batch_size=B, shuffle=False, seed=0)
    print(f"native={dl._use_native} threads={dl.num_threads} prefetch={dl.prefetch}", flush=True)

    # monkeypatch instrumentation
    events = []
    orig_decode = dl._decode_batch_native
    orig_place = dl._place

    def timed_decode(bf):
        t0 = time.perf_counter()
        r = orig_decode(bf)
        events.append(("decode", t0, time.perf_counter()))
        return r

    def timed_place(item):
        t0 = time.perf_counter()
        r = orig_place(item)
        events.append(("place", t0, time.perf_counter()))
        return r

    dl._decode_batch_native = timed_decode
    dl._place = timed_place

    t_epoch0 = time.perf_counter()
    last = None
    for i, b in enumerate(dl.epoch(0)):
        now = time.perf_counter()
        events.append(("consume", last if last is not None else t_epoch0, now))
        last = now
        if i + 1 >= args.nbatches:
            break

    base = t_epoch0
    print(f"{'stage':8s} {'start':>8s} {'end':>8s} {'dur':>7s}")
    for name, t0, t1 in sorted(events, key=lambda e: e[1]):
        print(f"{name:8s} {t0 - base:8.3f} {t1 - base:8.3f} {t1 - t0:7.3f}", flush=True)

    for name in ("decode", "place", "consume"):
        ds = [t1 - t0 for n, t0, t1 in events if n == name]
        if ds:
            print(f"{name}: n={len(ds)} mean={sum(ds)/len(ds):.3f} min={min(ds):.3f} max={max(ds):.3f}")


if __name__ == "__main__":
    main()
