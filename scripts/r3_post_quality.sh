#!/bin/bash
# Round-3 closing measurements, run sequentially on the TPU after the
# quality A/B frees the chip.  Each stage logs to its own file so partial
# completion still yields recordable numbers.
set -x
cd /root/repo
# 1. March early-stop on the TRAINED marcher (VERDICT task 7)
timeout 1500 python scripts/bench_early_stop_trained.py \
    --workdir /root/repo/logs/quality_r3 --renderer AVR_q --epoch 625 \
    --eps 0,0.05 --iters 30 > logs/r3_early_stop.log 2>&1
# 2. VR locality sort A/B with the scatter-free permutation VJP (task 5)
AB_ITERS=20 timeout 2400 python scripts/ab_vr_tpu.py \
    > logs/r3_vr_sort_ab.log 2>&1
# 3. VR chunked-call stash backward (task 5, memory route)
BENCH_RENDERER=vr BENCH_STEP=calls BENCH_RAY_CHUNKS=8 BENCH_ITERS=10 \
    timeout 1800 python bench.py > logs/r3_vr_calls.log 2>&1
echo done
