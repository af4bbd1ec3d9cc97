"""Summarize a measure_r2.sh log into a ranked flag table.

Usage: python tools/summarize_measure.py MEASURE_r3_raw.log

Parses the `=== label ===` / JSON-line structure the batch emits and
prints render and train tables sorted by value, with speedups vs the
flagship baselines ("render cull=1 16x16" and "train cull mm relayout"),
plus a suggested flag-default verdict per A/B axis.
"""

from __future__ import annotations

import json
import re
import sys


def parse(path: str):
    rows = []  # (label, dict)
    label = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = re.match(r"^=== (.*) ===$", line)
            if m:
                label = m.group(1)
                continue
            if line.startswith("{") and label:
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in d and "value" in d:
                    rows.append((label, d))
                    label = None
    return rows


def table(rows, kind, base_label):
    sel = [(l, d) for l, d in rows if kind in d["metric"]]
    if not sel:
        return
    base = next((d["value"] for l, d in sel if l == base_label), None)
    print(f"\n## {kind} (baseline: {base_label} = {base})")
    print(f"{'config':32s} {'value':>9s} {'unit':>9s} {'vs base':>8s} {'stale':>6s}")
    for l, d in sorted(sel, key=lambda x: -x[1]["value"]):
        rel = f"{(d['value'] / base - 1):+.1%}" if base else "n/a"
        stale = "STALE" if d.get("stale") else ""
        print(f"{l:32s} {d['value']:>9.3f} {d['unit']:>9s} {rel:>8s} {stale:>6s}")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "MEASURE_r3_raw.log"
    rows = parse(path)
    if not rows:
        print(f"no result rows found in {path}")
        return 1
    table(rows, "render_fps", "render cull=1 16x16")
    table(rows, "train_its", "train cull mm relayout")
    print("\nFlag axes to decide (flip the winner into the default):")
    # Only the surviving axes (round 3 deleted the losing A/B arms; see
    # docs/PERFORMANCE.md for the measured outcomes baked into defaults).
    for axis, a, b in [
        ("GS_TPU_POWER", "render cull=1 16x16", "render horner power"),
        ("GS_TPU_EXPAND", "render cull=1 16x16", "render fused expand"),
    ]:
        va = next((d["value"] for l, d in rows if l == a), None)
        vb = next((d["value"] for l, d in rows if l == b), None)
        if va and vb:
            win = a if va >= vb else b
            print(f"  {axis:24s}: {win}  ({va:.2f} vs {vb:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
