#!/bin/bash
# Round-4 measurement batch: settle the forward record routing (sortpay
# payload-sort vs row gather), refresh train at the final shipping config
# (relayout 2048 fix in), and publish the roofline + gather microbench.
# Each row runs under `timeout` with stderr captured (round-3 advisor:
# a dead config must leave an attributable hole, not truncate the batch).
cd "$(dirname "$0")/.." || exit 1
LOG=MEASURE_r4.log
run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 3000 env "$@" GS_BENCH_RETRIES=2 python bench.py \
    2> >(tail -3 >> "$LOG") | tee -a "$LOG"
}

# A/B: forward record routing, render + train, both scenes
run "r cloud gather (baseline)"   GS_TPU_FWD_RECORDS=gather
run "r cloud sortpay"             GS_TPU_FWD_RECORDS=sortpay
run "r shell gather"              GS_TPU_FWD_RECORDS=gather GS_BENCH_SCENE=shell
run "r shell sortpay"             GS_TPU_FWD_RECORDS=sortpay GS_BENCH_SCENE=shell
run "t cloud gather"              GS_TPU_FWD_RECORDS=gather GS_BENCH_MODE=train
run "t cloud sortpay"             GS_TPU_FWD_RECORDS=sortpay GS_BENCH_MODE=train
run "t shell gather"              GS_TPU_FWD_RECORDS=gather GS_BENCH_MODE=train GS_BENCH_SCENE=shell

echo "=== roofline ===" | tee -a "$LOG"
timeout 3000 python tools/profile_stages.py roofline 2>&1 | tee -a "$LOG"
echo "=== microbench_gather ===" | tee -a "$LOG"
timeout 3000 python tools/microbench_gather.py 2>&1 | tee -a "$LOG"
echo "=== batch done ===" | tee -a "$LOG"
