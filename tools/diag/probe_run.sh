#!/bin/bash
# Round-4 VERDICT item 2: point the linear/kNN probe at real SSL
# checkpoints vs the --weights random untrained control.
# Usage: bash tools/diag/probe_run.sh <arch> <ckpt> <outdir>
set -x
cd /root/repo
ARCH=$1; CKPT=$2; OUT=$3; PREP=${4:-/tmp/bcss_prep}
STATS="--mean 0.6998 0.4785 0.6609 --std 0.2203 0.2407 0.1983"
DATA="--data-name bcss --train-data $PREP --fold 0"

for W in trained random; do
  [ $W = trained ] && WARG=$CKPT || WARG=random
  for SPLIT in train val; do
    python tools/extract_features.py -a $ARCH --weights $WARG $DATA \
        --split $SPLIT --branch context --scales 4 --amp $STATS \
        --log-dir $OUT/fx_${W}_${SPLIT} --out $OUT/feats_${W}_${SPLIT} || exit 1
  done
  for PROBE in linear knn; do
    python tools/linear_probe.py --features $OUT/feats_${W}_train \
        --features-val $OUT/feats_${W}_val --data-name bcss \
        --train-data $PREP --key context_s4 \
        --probe $PROBE --log-dir $OUT/probe_${W}_${PROBE} \
        --out $OUT/probe_${W}_${PROBE}_out || exit 2
  done
done
echo PROBE_DONE
for f in $OUT/probe_*_out.json; do echo "== $f"; cat $f | head -20; done
