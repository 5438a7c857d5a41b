#!/bin/bash
# Round-3 follow-up campaign (after the decompress fix): pin the 2^20 MSM
# window width empirically (the fitted model chose w=16 -> 6.8 s; w=14/15
# project ~2.2 s from the 2^18 point) and split stage A of the 2^16 MSM
# (sort vs gather vs cneg) to pick the gather layout redesign.
cd /root/repo
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1
echo "=== campaign2 start $(date +%F.%T) ==="

echo "--- c2 step 1: 2^20 msm at w=14 and w=15 ---"
BENCH_SKIP_EFF=1 BENCH_NB= BENCH_SWEEP=20 BENCH_ITERS=2 BENCH_WBITS=14 \
  timeout 7200 python bench.py
BENCH_SKIP_EFF=1 BENCH_NB= BENCH_SWEEP=20 BENCH_ITERS=2 BENCH_WBITS=15 \
  timeout 7200 python bench.py

echo "--- c2 step 2: stage-A split at 2^16 ---"
timeout 3600 python bench/stage_a_split.py

echo "=== campaign2 done $(date +%F.%T) ==="
