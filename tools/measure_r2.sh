#!/bin/bash
# Round-2 measurement batch: run once when the TPU tunnel is up.
# Each line prints a labeled JSON result; total ~15-30 min incl. compiles.
set -u
cd "$(dirname "$0")/.."
run() {
  local label="$1"; shift
  echo "=== $label ==="
  timeout 1500 env "$@" python bench.py 2>&1 | tail -2
}

run "render mm-scan relayout"   GS_TPU_LANE_SCAN=mm
run "render roll-scan"          GS_TPU_LANE_SCAN=roll
run "train mm relayout"         GS_BENCH_MODE=train GS_TPU_LANE_SCAN=mm GS_TPU_BWD_ROUTING=relayout
run "train mm direct-routing"   GS_BENCH_MODE=train GS_TPU_LANE_SCAN=mm GS_TPU_BWD_ROUTING=direct
run "train roll relayout"       GS_BENCH_MODE=train GS_TPU_LANE_SCAN=roll GS_TPU_BWD_ROUTING=relayout
echo "=== stage profile (best flags: rerun manually after inspecting) ==="
timeout 2400 python tools/profile_stages.py render routing 2>&1 | tail -20
