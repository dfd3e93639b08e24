"""Categorized device-time summary of a JAX TPU xplane trace."""
import re
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())


def categorize(name):
    if name.startswith(('%copy-start', '%slice-start', '%copy-done', '%slice-done', '%_call')):
        return 'async-copy (overlapped)'
    if '18432' in name or '9216,9216' in name or 'inter_projector' in name:
        if 'convolution' in name or 'dot' in name:
            return 'fuser-head matmul'
        return 'fuser-head other (opt/elementwise)'
    if 'convolution' in name:
        return 'conv fusion'
    if 'reduce' in name:
        return 'reduce fusion (BN stats etc)'
    if 'select-and-scatter' in name:
        return 'maxpool bwd'
    if re.search(r'1024,1024', name):
        return 'aug (1024px ops)'
    return 'other fusion/elementwise'


for p in xs.planes:
    if 'TPU' not in p.name:
        continue
    ev_meta = p.event_metadata
    for line in p.lines:
        if line.name not in ('XLA Ops',):
            continue
        cats = defaultdict(int)
        n_ev = 0
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            # long name with operand info lives in display_name or name
            dn = ev_meta[ev.metadata_id].display_name or name
            cats[categorize(name + ' ' + dn)] += ev.duration_ps
            n_ev += 1
        sync = {k: v for k, v in cats.items() if 'overlapped' not in k}
        total = sum(sync.values())
        print(f'line {line.name}: {n_ev} events; synchronous op time {total/1e9:.1f} ms (3 steps)')
        for k, d in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f'  {d/1e9:10.2f} ms  {k}')
