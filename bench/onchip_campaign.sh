#!/bin/bash
# On-chip measurement campaign: fired by bench/probe_loop.sh the moment the
# axon tunnel answers (it has died for hours at a time mid-round; capture
# early, persist everything — VERDICT r2 #1/#2/#5).  Each step is its own
# process with a hard timeout; results persist via bench/onchip_ledger.json
# and this log.  Steps, in value order:
#   1. fused batch-verify at nb=256,1024 (the headline; ledger-recorded)
#   2. MSM sweep 2^14/16/18 with parity (ledger-recorded)
#   3. the 2^20 MSM point (BASELINE config 2 upper end)
#   4. seq-pipeline tile sweep (scan-width lever, ROUND3-NOTES #3)
cd /root/repo
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1
echo "=== campaign start $(date +%F.%T) ==="

echo "--- step 1: batch verify (fused path) ---"
BENCH_NB=256,1024 BENCH_ITERS=3 timeout 5400 python bench.py --onchip-now

echo "--- step 2: msm sweep 14,16,18 ---"
BENCH_SKIP_EFF=1 BENCH_NB= BENCH_SWEEP=14,16,18 timeout 5400 python bench.py

echo "--- step 3: 2^20 msm ---"
BENCH_SKIP_EFF=1 BENCH_NB= BENCH_SWEEP=20 BENCH_ITERS=2 \
  timeout 7200 python bench.py

echo "--- step 4: seq tile sweep at 2^16 ---"
timeout 5400 python bench/seq_sweep.py

echo "--- step 5: batch verify, host-decompress variant (comparison) ---"
BENCH_HOST_DECOMP=1 BENCH_NB=256 BENCH_ITERS=3 \
  timeout 3600 python bench.py --onchip-now

echo "--- step 6: msm stage profile at 2^16 ---"
timeout 3600 python bench/msm_stages.py

echo "=== campaign done $(date +%F.%T) ==="
