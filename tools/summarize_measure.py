"""Summarize tools/measure_r2.sh output into a sorted table.

Usage: python tools/summarize_measure.py /tmp/vdrive/measure_r2_results.txt
"""

import json
import re
import sys


def main(path):
    label = None
    rows = []
    for line in open(path):
        m = re.match(r"^=== (.+) ===$", line.strip())
        if m:
            label = m.group(1)
            continue
        if line.startswith("{") and label:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append((label, d.get("metric"), d.get("value"),
                         d.get("unit"), d.get("vs_baseline")))
            label = None
    for metric in sorted({r[1] for r in rows}):
        print(f"\n== {metric} ==")
        sel = sorted((r for r in rows if r[1] == metric),
                     key=lambda r: -(r[2] or 0))
        for label, _, value, unit, vsb in sel:
            print(f"  {value:10.3f} {unit:8s} vs_baseline={vsb:.3f}  {label}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vdrive/measure_r2_results.txt")
