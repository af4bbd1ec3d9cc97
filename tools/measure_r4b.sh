#!/bin/bash
# Round-4 batch, part 2: scan-precision A/B (MXU pass count of the
# prefix-scan matmuls), shell train refresh, roofline + gather microbench
# publication. A/B arms set GS_BENCH_NOSAVE=1 so only default-flag rows
# refresh MEASURED.json.
cd "$(dirname "$0")/.." || exit 1
LOG=MEASURE_r4.log
run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 2000 env "$@" GS_BENCH_RETRIES=1 python bench.py \
    2> >(tail -3 >> "$LOG") | tee -a "$LOG"
}

run "t shell (default flags)"   GS_BENCH_MODE=train GS_BENCH_SCENE=shell
run "r cloud scanprec=high"     GS_BENCH_NOSAVE=1 GS_BENCH_SCENE=cloud GS_TPU_SCAN_PREC=high
run "t cloud cgwprec=high"      GS_BENCH_NOSAVE=1 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_TPU_CGW_PREC=high
run "t cloud scan+cgw=high"     GS_BENCH_NOSAVE=1 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_TPU_SCAN_PREC=high GS_TPU_CGW_PREC=high

echo "=== roofline ===" | tee -a "$LOG"
timeout 2000 python tools/profile_stages.py roofline 2>&1 | tee -a "$LOG"
echo "=== microbench_gather ===" | tee -a "$LOG"
timeout 2000 python tools/microbench_gather.py 2>&1 | tee -a "$LOG"
echo "=== batch 2 done ===" | tee -a "$LOG"
