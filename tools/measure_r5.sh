#!/bin/bash
# Round-5 measurement batch: the backward-pass diet (VERDICT r4 item 1).
# A/B arms for the backward-only MXU precision flags, the shared
# transmittance-scan precision, and tile geometry for TRAINING (the
# backward routing + kernel scale with K, so 32x32's smaller K can win
# for train even where it loses for render). Non-default arms set
# GS_BENCH_NOSAVE=1 so MEASURED.json keeps last-known-good defaults.
#
# Usage: bash tools/measure_r5.sh [ply_path]  (ply rows skipped if absent)
set -u
cd "$(dirname "$0")/.."
PLY="${1:-assets/trained_r5.ply}"
export JAX_PLATFORMS=''
B="env GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200"

row() {  # row <label> <env...>
  local label="$1"; shift
  echo "=== $label ==="
  timeout 2400 env "$@" python bench.py 2>&1 | tail -1
}

echo "### render cloud"
row "r cloud base"                GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud
row "r cloud scanhigh"            GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_NOSAVE=1 GS_TPU_SCAN_PREC=high

echo "### train cloud (priority: >=12 it/s target)"
row "t cloud base"                GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train
row "t cloud cgwhigh"             GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_TPU_CGW_PREC=high
row "t cloud allhigh"             GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_TPU_CGW_PREC=high GS_TPU_MOM_PREC=high GS_TPU_CG_PREC=high
row "t cloud allhigh+scan"        GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_TPU_CGW_PREC=high GS_TPU_MOM_PREC=high GS_TPU_CG_PREC=high GS_TPU_SCAN_PREC=high
row "t cloud 32x32"               GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_BENCH_TILE_W=32 GS_BENCH_TILE_H=32
row "t cloud allhigh 32x32"       GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=cloud GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_BENCH_TILE_W=32 GS_BENCH_TILE_H=32 GS_TPU_CGW_PREC=high GS_TPU_MOM_PREC=high GS_TPU_CG_PREC=high

if [ -f "$PLY" ]; then
  echo "### trained ply"
  row "r ply base"                GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=ply GS_BENCH_PLY="$PLY"
  row "t ply base"                GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=ply GS_BENCH_PLY="$PLY" GS_BENCH_MODE=train
  row "t ply allhigh"             GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=ply GS_BENCH_PLY="$PLY" GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_TPU_CGW_PREC=high GS_TPU_MOM_PREC=high GS_TPU_CG_PREC=high
  row "t ply allhigh 32x32"       GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=2200 GS_BENCH_SCENE=ply GS_BENCH_PLY="$PLY" GS_BENCH_MODE=train GS_BENCH_NOSAVE=1 GS_BENCH_TILE_W=32 GS_BENCH_TILE_H=32 GS_TPU_CGW_PREC=high GS_TPU_MOM_PREC=high GS_TPU_CG_PREC=high
else
  echo "### trained ply: $PLY absent, skipped"
fi

echo "### gradient accuracy at reduced precision (vs HIGHEST, on-chip)"
timeout 1800 python tools/check_grad_prec.py || echo "grad check FAILED"
