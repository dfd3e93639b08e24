#!/bin/bash
# Round-3 validation sweep: all headline benches, one JSON line each.
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo
echo "=== r18 default headline (pipeline b32 adam) ==="
timeout 3600 python bench.py
echo "=== r18 pipeline b64 probe ==="
BENCH_BATCH=64 timeout 3600 python bench.py
echo "=== r50 canonical (fused_adafactor, no remat — fits since the fused heads dropped the dense grad) ==="
BENCH_ARCH=resnet50 BENCH_BATCH=16 \
BENCH_INTER_DTYPE=bfloat16 BENCH_INTER_OPT=fused_adafactor timeout 3600 python bench.py
echo "=== r50 remat-stages-1,2 variant (CLI safe default) ==="
BENCH_ARCH=resnet50 BENCH_BATCH=16 BENCH_USE_AC=1 BENCH_REMAT_STAGES=1,2 \
BENCH_INTER_DTYPE=bfloat16 BENCH_INTER_OPT=fused_adafactor timeout 3600 python bench.py
echo "=== hooknet b32 packed (tail+logits+term-skip+mxu-resize) ==="
BENCH_MODE=hooknet BENCH_BATCH=32 BENCH_PACKED_TAIL=1 timeout 3600 python bench.py
echo "=== hooknet b32 packed_from=2 ==="
BENCH_MODE=hooknet BENCH_BATCH=32 BENCH_PACKED_TAIL=1 BENCH_PACKED_FROM=2 timeout 3600 python bench.py
echo "=== infer chunk128 unpacked (mxu-resize) ==="
BENCH_MODE=infer BENCH_BATCH=128 timeout 3600 python bench.py
echo "=== sweep done ==="
