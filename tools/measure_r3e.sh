#!/bin/bash
# Round-3 session-2 measurement batch: settle the capacity-bucket
# granularity (2^17 vs default 2^18) and the expand form on both the
# worst-case (cloud) and trained-proxy (shell) scenes, render and train.
# Appends to MEASURE_r3e.log; each row is one bench.py invocation.
cd "$(dirname "$0")/.." || exit 1
LOG=MEASURE_r3e.log
run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  env "$@" GS_BENCH_RETRIES=2 python bench.py 2>/dev/null | tee -a "$LOG"
}

run "r cloud bucket17"            GS_BENCH_BUCKET_BITS=17
run "r cloud bucket17 percol"     GS_BENCH_BUCKET_BITS=17 GS_TPU_EXPAND=percol
run "r shell bucket17"            GS_BENCH_BUCKET_BITS=17 GS_BENCH_SCENE=shell
run "t cloud bucket17"            GS_BENCH_BUCKET_BITS=17 GS_BENCH_MODE=train
run "t shell bucket17"            GS_BENCH_BUCKET_BITS=17 GS_BENCH_MODE=train GS_BENCH_SCENE=shell
run "r cloud bucket16"            GS_BENCH_BUCKET_BITS=16
echo "=== batch done ===" | tee -a "$LOG"
