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
            if m.name.startswith(('%copy-start', '%slice-start', '%copy-done', '%slice-done')):
                continue
            key = (m.display_name or m.name)[:150]
            agg[key][0] += ev.duration_ps
            agg[key][1] += 1
        for k, (d, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
            print(f'{d/1e9:9.2f} ms  x{n:4d}  {k}')
