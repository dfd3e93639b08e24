"""Top XLA ops with full metadata: long name, shapes/layouts, and any
bytes-accessed / flops stats the xplane carries. Usage:
  python top_ops_detail.py <vm.xplane.pb> [N]
"""
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())
N = int(sys.argv[2]) if len(sys.argv) > 2 else 15

for p in xs.planes:
    if 'TPU' not in p.name:
        continue
    ev_meta = p.event_metadata
    stat_meta = p.stat_metadata
    for line in p.lines:
        if line.name != 'XLA Ops':
            continue
        agg = defaultdict(lambda: [0, 0, None])
        for ev in line.events:
            m = ev_meta[ev.metadata_id]
            if m.name.startswith(('%copy-start', '%slice-start', '%copy-done', '%slice-done')):
                continue
            key = m.display_name or m.name
            agg[key][0] += ev.duration_ps
            agg[key][1] += 1
            agg[key][2] = ev
        for k, (d, n, ev) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:N]:
            print(f'{d/1e9:9.2f} ms  x{n:4d}  {k}')
            m = ev_meta[ev.metadata_id]
            for s in list(ev.stats) + list(m.stats):
                name = stat_meta[s.metadata_id].name
                val = (s.str_value or s.int64_value or s.uint64_value or
                       s.double_value or (s.ref_value and stat_meta[s.ref_value].name))
                if name in ('hlo_op', 'tf_op', 'hlo_category', 'flops', 'bytes accessed',
                            'bytes_accessed', 'long_name', 'expression', 'equation',
                            'memory_bandwidth', 'model_flops'):
                    print(f'              {name}: {str(val)[:600]}')
            print()
