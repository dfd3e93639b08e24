import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())
for p in xs.planes:
    if 'TPU' not in p.name:
        continue
    ev_meta = p.event_metadata
    for line in p.lines:
        if line.name != 'XLA Ops':
            continue
        agg = defaultdict(lambda: [0, 0])
        for ev in line.events:
            m = ev_meta[ev.metadata_id]
            dn = (m.display_name or m.name)
            if '18432' not in dn and '9216' not in dn and 'inter_p' not in dn:
                continue
            agg[dn[:180]][0] += ev.duration_ps
            agg[dn[:180]][1] += 1
        tot = sum(v[0] for v in agg.values())
        print(f"total head time {tot/1e9:.1f} ms over {len(agg)} ops (3 steps)")
        for k, (d, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
            print(f'{d/1e9:8.2f} ms x{n:3d}  {k[:150]}')
