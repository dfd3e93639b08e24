"""Achieved-bandwidth audit: every XLA op over a time threshold, with
bytes_accessed-derived GB/s, sorted by total time. Flags ops far below the
achievable streaming bandwidth (~640 GB/s on the v5e, hbm_roofline.py).

Usage: python bw_audit.py <vm.xplane.pb> [min_ms_total]
"""
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())
min_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

for p in xs.planes:
    if 'TPU' not in p.name:
        continue
    ev_meta = p.event_metadata
    stat_meta = p.stat_metadata
    for line in p.lines:
        if line.name != 'XLA Ops':
            continue
        agg = defaultdict(lambda: [0, 0, 0, 0, ""])
        for ev in line.events:
            m = ev_meta[ev.metadata_id]
            if m.name.startswith(('%copy-start', '%slice-start', '%copy-done', '%slice-done')):
                continue
            key = m.display_name or m.name
            a = agg[key]
            a[0] += ev.duration_ps
            a[1] += 1
            for s in list(ev.stats) + list(m.stats):
                nm = stat_meta[s.metadata_id].name
                if nm == 'bytes_accessed':
                    a[2] = s.int64_value or s.uint64_value
                elif nm == 'flops':
                    a[3] = s.int64_value or s.uint64_value
                elif nm == 'tf_op':
                    a[4] = s.str_value
        rows = []
        tot_ms = tot_slow_ms = 0.0
        for k, (dps, n, byt, fl, tf) in agg.items():
            ms = dps / 1e9
            tot_ms += ms
            if ms < min_ms:
                continue
            sec_per = (dps / n) / 1e12
            gbs = (byt / sec_per / 1e9) if byt else 0.0
            tfs = (fl / sec_per / 1e12) if fl else 0.0
            rows.append((ms, n, gbs, tfs, k, tf))
            if byt and gbs < 400 and tfs < 40:
                tot_slow_ms += ms
        for ms, n, gbs, tfs, k, tf in sorted(rows, reverse=True):
            flag = " <<<" if (gbs and gbs < 400 and tfs < 40) else ""
            print(f"{ms:8.2f} ms x{n:3d}  {gbs:6.0f} GB/s {tfs:6.1f} TF/s  {k[:40]:40s} {tf.split('/')[-1][:60]}{flag}")
        print(f"\ntotal {tot_ms:.1f} ms; flagged(<400GB/s & <40TF/s) {tot_slow_ms:.1f} ms")
