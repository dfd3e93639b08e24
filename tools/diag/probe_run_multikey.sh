#!/bin/bash
# Round-5 probe protocol: multi-key (context_s1..s4 + target_s1..s4) linear
# + kNN probes for a set of encoder legs on one prepared corpus.
# Usage: bash tools/diag/probe_run_multikey.sh <arch> <outdir> <prep> name=ckpt [name=ckpt ...]
#   (ckpt = Orbax dir / .pth.tar, or the literal "random" for the control)
set -x
cd /root/repo
ARCH=$1; OUT=$2; PREP=$3; shift 3
STATS="--mean 0.6998 0.4785 0.6609 --std 0.2203 0.2407 0.1983"
DATA="--data-name bcss --train-data $PREP --fold 0"
KEYS="context_s1 context_s2 context_s3 context_s4 target_s1 target_s2 target_s3 target_s4"

for LEG in "$@"; do
  W=${LEG%%=*}; CKPT=${LEG#*=}
  for SPLIT in train val; do
    # Resumable: extraction is the expensive TPU stage — skip if present.
    [ -d $OUT/feats_${W}_${SPLIT} ] && continue
    python tools/extract_features.py -a $ARCH --weights $CKPT $DATA \
        --split $SPLIT --branch both --scales 1,2,3,4 --amp $STATS \
        --log-dir $OUT/fx_${W}_${SPLIT} --out $OUT/feats_${W}_${SPLIT} || exit 1
  done
  for KEY in $KEYS; do
    for PROBE in linear knn; do
      [ -f $OUT/probe_${W}_${KEY}_${PROBE}_out.json ] && continue
      # Probes are tiny (<=678x512 features): local XLA:CPU compiles in
      # seconds, vs ~10 min per (probe, dim) shape through the tunneled
      # remote TPU compiler. Force CPU (tools/_common honors the env).
      JAX_PLATFORMS=cpu python tools/linear_probe.py --features $OUT/feats_${W}_train \
          --features-val $OUT/feats_${W}_val --data-name bcss \
          --train-data $PREP --key $KEY \
          --probe $PROBE --log-dir $OUT/probe_${W}_${KEY}_${PROBE} \
          --out $OUT/probe_${W}_${KEY}_${PROBE}_out || exit 2
    done
  done
done
echo PROBE_DONE
python - "$OUT" << 'EOF'
import json, sys, glob, os
out = sys.argv[1]
rows = {}
for f in sorted(glob.glob(os.path.join(out, "probe_*_out.json"))):
    d = json.load(open(f))
    name = os.path.basename(f)[len("probe_"):-len("_out.json")]
    leg, rest = name.split("_", 1)
    key = rest.rsplit("_", 1)[0]
    probe = rest.rsplit("_", 1)[1]
    ci = d["val"].get("acc_ci95", [float("nan")] * 2)
    rows.setdefault((leg, key), {})[probe] = (
        d["val"]["acc"], ci, d["train"]["acc"])
print(f"{'leg':10s} {'key':12s} {'lin val [ci95]':>22s} {'knn val [ci95]':>22s} {'lin trn':>8s} {'knn trn':>8s}")
for (leg, key), p in sorted(rows.items()):
    lv, lci, lt = p.get("linear", (float("nan"), [float("nan")] * 2, float("nan")))
    kv, kci, kt = p.get("knn", (float("nan"), [float("nan")] * 2, float("nan")))
    print(f"{leg:10s} {key:12s} {lv:6.3f} [{lci[0]:.2f},{lci[1]:.2f}] "
          f"{kv:6.3f} [{kci[0]:.2f},{kci[1]:.2f}] {lt:8.3f} {kt:8.3f}")
EOF
