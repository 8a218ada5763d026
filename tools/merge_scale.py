#!/usr/bin/env python3
"""Merge ScaleCheck sweep logs into per-stage min + sample-band statistics.

Usage: python3 tools/merge_scale.py --f1 log1x_a.txt,log1x_b.txt --f20 log20x_a.txt,...

Each log is a `graft.ScaleCheck` stderr/stdout capture with lines like
`[scale] stage_name    12.34 s`. Emits one line per stage:

    stage  min1x  band1x  min20x  band20x  ratio

where bandNx = max/min across that factor's samples (1.0 = perfectly
stable). The PLANS.md protocol (round 18): report the MIN, DISCLOSE the
band, and isolated-re-measure any stage whose band exceeds 2x so no ratio
rests on a single sample from a wide band.
"""
import argparse
import re
from collections import defaultdict

LINE = re.compile(r"\[scale\] (\S+)\s+([0-9.]+) s")


def collect(paths):
    samples = defaultdict(list)
    for p in paths:
        for line in open(p):
            m = LINE.search(line)
            if m:
                samples[m.group(1)].append(float(m.group(2)))
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f1", required=True, help="comma-separated 1x logs")
    ap.add_argument("--f20", required=True, help="comma-separated 20x logs")
    args = ap.parse_args()
    s1 = collect(args.f1.split(","))
    s20 = collect(args.f20.split(","))
    print(f"{'stage':30} {'1x_min':>7} {'1x_band':>8} {'20x_min':>8} {'20x_band':>9} {'ratio':>6} {'n1/n20':>6}")
    wide = []
    for stage in sorted(set(s1) | set(s20)):
        a, b = s1.get(stage, []), s20.get(stage, [])
        if not a or not b:
            print(f"{stage:30} MISSING samples (1x={len(a)}, 20x={len(b)})")
            continue
        m1, m20 = min(a), min(b)
        b1, b20 = max(a) / m1, max(b) / m20
        print(f"{stage:30} {m1:7.2f} {b1:7.1f}x {m20:8.2f} {b20:8.1f}x "
              f"{m20 / m1:5.1f}x {len(a)}/{len(b)}")
        if b1 > 2 or b20 > 2:
            wide.append(stage)
    if wide:
        print("\nband > 2x (isolated re-measure these):", ",".join(wide))


if __name__ == "__main__":
    main()
