#!/usr/bin/env python3
"""Build the SCALING.md growth table for the scale-stress run.

Compares per-query times between two Bench JSON artifacts (normally
the self-generated mult=1 run and the mult=10 "sf1" run — same
generator, pure 10x data) and prints a markdown table sorted by
growth factor, worst first. Also cross-checks the mult=1 run against
the committed driver-sf0.1 numbers as a generator-fidelity signal.

Usage: tools/scale_table.py BENCH_SCALE_UNI1.json BENCH_SCALE_SF1.json [committed_sf0.1.json]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}, d


def main():
    uni, du = load(sys.argv[1])
    sf1, d1 = load(sys.argv[2])
    rows = []
    for q, t1 in sorted(sf1.items()):
        t0 = uni.get(q)
        if t0 is None or t0 <= 0:
            continue
        rows.append((q, t0, t1, t1 / t0))
    rows.sort(key=lambda r: -r[3])
    print("| query | mult=1 | mult=10 | growth over 10x data |")
    print("|---|---|---|---|")
    for q, t0, t1, g in rows:
        print(f"| {q} | {t0:.2f} s | {t1:.2f} s | {g:.1f}x |")
    tot0 = sum(uni[q] for q, *_ in [(r[0],) for r in rows])
    tot1 = sum(sf1[q] for q, *_ in [(r[0],) for r in rows])
    growths = sorted(r[3] for r in rows)
    med = growths[len(growths) // 2]
    print()
    print(f"totals: mult=1 {tot0:.1f} s -> mult=10 {tot1:.1f} s "
          f"({tot1 / tot0:.2f}x); median per-query growth {med:.2f}x; "
          f"queries over 3x: {sum(1 for g in growths if g > 3)}")
    if len(sys.argv) > 3:
        drv, _ = load(sys.argv[3])
        common = [q for q in uni if q in drv and drv[q] > 0]
        ratio = sum(uni[q] for q in common) / sum(drv[q] for q in common)
        print(f"fidelity: mult=1 total vs committed driver-sf0.1 total "
              f"over {len(common)} queries = {ratio:.2f}x")


if __name__ == "__main__":
    main()
