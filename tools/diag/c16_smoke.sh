#!/bin/bash
# Round-4 VERDICT item 3: shortened scripts/c16.sh pretrain leg ON THE TPU
# against the synthetic Camelyon16 corpus (make_synthetic_slides --layout
# c16), across >=3 epochs with a resume that must rejoin the per-epoch
# resample schedule (camelyon.py:79-83 parity).
set -x
cd /root/repo
C16="--data-name camelyon16 --data /tmp/c16 \
     --mean 0.5783 0.3970 0.6128 --std 0.2424 0.2379 0.1918"

python tools/ssl_train.py -a resnet18 -j 4 -b 32 --epochs 3 --lr 1e-3 \
    $C16 --amp --bf16 --tf32 --save-freq 1 --seed 3407 \
    --allow-random-init --log-dir logs/c16_smoke/pre || exit 1

python tools/ssl_train.py -a resnet18 -j 4 -b 32 --epochs 5 --lr 1e-3 \
    $C16 --amp --bf16 --tf32 --save-freq 1 --seed 3407 \
    --allow-random-init --resume logs/c16_smoke/pre/checkpoint_0002 \
    --log-dir logs/c16_smoke/resume || exit 2

grep -q "camelyon resampling rejoined at epoch 3" logs/c16_smoke/resume/log.txt \
    || { echo "RESUME DID NOT REJOIN SCHEDULE"; exit 3; }
echo C16_SMOKE_DONE
