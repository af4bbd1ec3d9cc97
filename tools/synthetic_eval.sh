#!/bin/bash
# Synthetic multi-scene full_eval (VERDICT r4 item 7b): the sandbox has no
# datasets and no egress, so this is the strongest buildable stand-in for
# the reference's 13-scene protocol (full_eval.py:39-75) — THREE synthetic
# Blender-format scenes of two kinds, each driven through the REAL CLIs
# (train.py -> render.py -> metrics.py), results.json collected into
# EVAL_r5/ and committed. PSNR here is bounded by scene ambiguity (a
# semi-transparent cloud seen from a camera ring), not optimizer quality.
#
# Usage: bash tools/synthetic_eval.sh [out_root] [iters]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/vdrive/synth_eval}"
ITERS="${2:-2000}"
export JAX_PLATFORMS=''
mkdir -p "$OUT" EVAL_r5

gen() {  # gen <name> <kind> <seed> <P>
  local dir="$OUT/$1"
  [ -f "$dir/transforms_train.json" ] && return
  PYTHONPATH="$PWD:$PWD/tests" timeout 1800 python - "$dir" "$2" "$3" "$4" <<'PYEOF'
import sys, os
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
from make_synthetic_scene import make_blender_scene
make_blender_scene(sys.argv[1], width=256, height=256, n_train=20, n_test=4,
                   P=int(sys.argv[4]), seed=int(sys.argv[3]), kind=sys.argv[2])
PYEOF
}

echo "=== generating scenes ==="
gen lego_cloud cloud 11 3000
gen chair_objects objects 12 3000
gen mic_objects objects 13 2000

for s in lego_cloud chair_objects mic_objects; do
  echo "=== $s: train $ITERS iters ==="
  timeout 5400 python train.py -s "$OUT/$s" -m "$OUT/eval/$s" --eval \
    --iterations "$ITERS" --disable_viewer --quiet \
    --test_iterations "$ITERS" --save_iterations "$ITERS" \
    2>&1 | tail -3
  echo "=== $s: render ==="
  timeout 3600 python render.py -m "$OUT/eval/$s" --quiet 2>&1 | tail -2
  echo "=== $s: metrics ==="
  timeout 3600 python metrics.py -m "$OUT/eval/$s" 2>&1 | tail -6
  cp "$OUT/eval/$s/results.json" "EVAL_r5/${s}_results.json" 2>/dev/null \
    && echo "saved EVAL_r5/${s}_results.json"
  cp "$OUT/eval/$s/per_view.json" "EVAL_r5/${s}_per_view.json" 2>/dev/null || true
done
echo "=== synthetic_eval done ==="
