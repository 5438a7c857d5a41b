#!/bin/bash
# Round-5 on-chip campaign: run the moment the tunnel answers.  ONE
# process at a time (concurrent chip users -> FAILED_PRECONDITION).
# Order: cheap probe -> v5 MSM A/B -> fused-verify stage probe -> full
# bench capture.  Every step under timeout; partial results persist.
set -x
cd "$(dirname "$0")/.."

# 1) v5 stage A/B at 2^16 (compiles the new kernels; if Mosaic rejects
#    them this fails fast and we flip the env defaults back)
timeout 1800 python bench/stage_probe7.py 2>&1 | tee /tmp/probe7_16.log

# 2) 2^18 spot check of the winning combo
timeout 1200 env MS_LOG_N=18 MS_ITERS=2 python bench/stage_probe7.py \
    2>&1 | tee /tmp/probe7_18.log

# 3) fused-verify stage breakdown (early upload + sqr + v5 effects)
timeout 1200 python bench/fused_stage_probe.py 2>&1 | tee /tmp/fsp.log

# 4) full bench capture (inline sweep rides the warm batch child)
timeout 2400 python bench.py 2>&1 | tee /tmp/bench_r5.log
