#!/bin/bash
# Round-4 VERDICT item 1: ResNet-50 end-to-end convergence on the
# production memory-frugal config (accum=2 + fused_adafactor heads + bf16
# head storage) — the flagship perf config of BASELINE.md, previously
# backed only by 3-step parity tests. Mirrors the round-2 r18 recipe run
# (BASELINE.md "Recipe-path convergence run") at the published global
# batch 32 of /root/reference/scripts/bcss.sh:9-22.
set -x
cd /root/repo
STATS="--mean 0.6998 0.4785 0.6609 --std 0.2203 0.2407 0.1983"

python tools/ssl_train.py -a resnet50 -b 32 --lr 1e-3 --seed 3407 \
    --epochs 16 --data-name bcss --data /tmp/bcss_prep --fold 0 --amp \
    --accum-steps 2 --inter-opt fused_adafactor --inter-dtype bfloat16 \
    $STATS --save-freq 8 --allow-random-init \
    --log-dir logs/convergence_r50/pretrain || exit 1

python tools/ssl_finetune.py -a resnet50 -b 64 --epochs 10 --lr 1e-3 \
    --seed 3407 --data-name bcss --train-data /tmp/bcss_prep --fold 0 --amp \
    $STATS --weights logs/convergence_r50/pretrain/checkpoint_0015 \
    --log-dir logs/convergence_r50/finetune || exit 2

python tools/evaluate.py -a resnet50 --data-name bcss --train-data /tmp/bcss_prep \
    --fold 0 $STATS --amp \
    --weights logs/convergence_r50/finetune/best_ft_model \
    --log-dir logs/convergence_r50/eval || exit 3

echo R50_PIPELINE_DONE
