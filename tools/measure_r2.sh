#!/bin/bash
# Round-2 measurement batch: run once when the TPU tunnel is up.
# Each line prints a labeled JSON result; total ~30-60 min incl. compiles.
set -u
cd "$(dirname "$0")/.."
run() {
  local label="$1"; shift
  echo "=== $label ==="
  # single inner attempt per config (bench.py's own retry wrapper would
  # otherwise nest retries inside the outer timeout), no stale fallback
  # for A/B rows (we want a hole, not a stale number, if a config dies)
  timeout 1800 env GS_BENCH_RETRIES=1 GS_BENCH_TIMEOUT=1500 "$@" \
    python bench.py 2>&1 | tail -2
}

# Pin the baseline flag state explicitly so every row below measures
# against the SAME reference arm regardless of what the code's defaults
# are at the time the batch runs (defaults get flipped as rows win).
export GS_TPU_EXPAND=percol GS_TPU_POWER=moment GS_TPU_CARRY=min \
       GS_TPU_LANE_SCAN=mm GS_TPU_FWD_GATHER=direct GS_TPU_CULL_BITS=64 \
       GS_TPU_BWD_ROUTING=relayout GS_TPU_BOUNDARY_GATHER=relayout

# Headline rows FIRST: if the tunnel comes back with little round time
# left, a truncated batch must still contain the flagship numbers.
run "render flagship"           GS_TPU_EXPAND=fused GS_TPU_POWER=horner GS_TPU_CARRY=mxsum GS_TPU_FWD_GATHER=relayout GS_TPU_CULL_BITS=32
run "render cull=1 16x16"       GS_BENCH_TILE_CULL=1
run "train flagship"            GS_BENCH_MODE=train GS_TPU_EXPAND=fused GS_TPU_POWER=horner GS_TPU_CARRY=mxsum GS_TPU_FWD_GATHER=relayout GS_TPU_CULL_BITS=32 GS_TPU_BWD_ROUTING=relayout GS_TPU_BOUNDARY_GATHER=relayout
run "render flagship shell"     GS_BENCH_SCENE=shell GS_TPU_EXPAND=fused GS_TPU_POWER=horner GS_TPU_CARRY=mxsum GS_TPU_FWD_GATHER=relayout GS_TPU_CULL_BITS=32

# K-reduction: exact tile cull on/off (the round-2 headline change)
run "render cull=0 16x16"       GS_BENCH_TILE_CULL=0
# tile-size matrix (cull on): smaller tiles fit the ellipse tighter so the
# kernel does less pixel-x-entry work, at the price of more sorted entries
run "render cull=1 16x8"        GS_BENCH_TILE_W=16 GS_BENCH_TILE_H=8
run "render cull=1 8x16"        GS_BENCH_TILE_W=8 GS_BENCH_TILE_H=16
run "render cull=1 32x8"        GS_BENCH_TILE_W=32 GS_BENCH_TILE_H=8
run "render cull=1 16x32"       GS_BENCH_TILE_W=16 GS_BENCH_TILE_H=32
# 64 px/entry: 4x less pixel work per entry than 16x16 — the kernel runs at
# ~92% of VPU peak per lane op, so ops x K x pixels is the only lever; for
# small-splat (trained-like) scenes K grows little while pixels/entry drop 4x
run "render cull=1 8x8"         GS_BENCH_TILE_W=8 GS_BENCH_TILE_H=8
run "render cull=1 bits32"      GS_TPU_CULL_BITS=32
# lane-scan + bwd-routing A/B (train)
run "train boundary concat"     GS_BENCH_MODE=train GS_TPU_BOUNDARY_GATHER=concat
run "train cull bits32"         GS_BENCH_MODE=train GS_TPU_CULL_BITS=32
run "train cull mm relayout"    GS_BENCH_MODE=train GS_TPU_LANE_SCAN=mm GS_TPU_BWD_ROUTING=relayout
run "train cull mm direct"      GS_BENCH_MODE=train GS_TPU_LANE_SCAN=mm GS_TPU_BWD_ROUTING=direct
run "train cull roll relayout"  GS_BENCH_MODE=train GS_TPU_LANE_SCAN=roll GS_TPU_BWD_ROUTING=relayout
run "train nocull mm relayout"  GS_BENCH_MODE=train GS_BENCH_TILE_CULL=0
run "render mxsum carry"        GS_TPU_CARRY=mxsum
run "train mxsum carry"         GS_BENCH_MODE=train GS_TPU_CARRY=mxsum
run "render roll-scan"          GS_TPU_LANE_SCAN=roll
run "render fused expand"       GS_TPU_EXPAND=fused
run "train fused expand"        GS_BENCH_MODE=train GS_TPU_EXPAND=fused
run "render horner power"       GS_TPU_POWER=horner
run "render fwd-gather relayout" GS_TPU_FWD_GATHER=relayout
run "render best combo"         GS_TPU_EXPAND=fused GS_TPU_POWER=horner GS_TPU_CARRY=mxsum
run "train best combo"          GS_BENCH_MODE=train GS_TPU_EXPAND=fused GS_TPU_POWER=horner GS_TPU_CARRY=mxsum
# surface-shell proxy scene (trained-scene-like saturation; early-exit path)
run "render shell cull=1"       GS_BENCH_SCENE=shell
run "train shell"               GS_BENCH_MODE=train GS_BENCH_SCENE=shell
# tile sweep on the shell scene: smaller tiles saturate (all-pixel T<eps)
# sooner, so the early-exit interaction differs from the uniform scene
run "render shell 16x8"         GS_BENCH_SCENE=shell GS_BENCH_TILE_W=16 GS_BENCH_TILE_H=8
run "render shell 16x32"        GS_BENCH_SCENE=shell GS_BENCH_TILE_W=16 GS_BENCH_TILE_H=32
run "render shell 32x8"         GS_BENCH_SCENE=shell GS_BENCH_TILE_W=32 GS_BENCH_TILE_H=8
run "render shell 8x8"          GS_BENCH_SCENE=shell GS_BENCH_TILE_W=8 GS_BENCH_TILE_H=8
# Refresh the committed last-known-good (MEASURED.json) with the CODE
# DEFAULT flag configuration, so the driver's end-of-round bench.py has a
# fresh fallback even if nobody is around to flip flags after this batch.
echo "=== refresh MEASURED.json at code-default flags ==="
(
  unset GS_TPU_EXPAND GS_TPU_POWER GS_TPU_CARRY GS_TPU_LANE_SCAN \
        GS_TPU_FWD_GATHER GS_TPU_CULL_BITS GS_TPU_BWD_ROUTING \
        GS_TPU_BOUNDARY_GATHER
  run "render DEFAULTS"
  run "train DEFAULTS"          GS_BENCH_MODE=train
  run "render DEFAULTS shell"   GS_BENCH_SCENE=shell
)
echo "=== stage profile (best flags: rerun manually after inspecting) ==="
timeout 3600 python tools/profile_stages.py pre emit gather render grad routing train 2>&1 | tail -30
echo "=== roofline (speed-of-light bounds at current flags) ==="
timeout 3600 python tools/profile_stages.py roofline 2>&1 | tail -20
