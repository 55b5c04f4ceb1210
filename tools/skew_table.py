#!/usr/bin/env python3
"""Build SKEW_LOCAL.json + a markdown table from the uniform vs
hot-key Bench runs (ScaleGen --skew, same row counts).

Usage: tools/skew_table.py /tmp/skew_uniform.json /tmp/skew_skewed.json
Writes SKEW_LOCAL.json and prints the SCALING.md table block.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main():
    uni = load(sys.argv[1])
    skew = load(sys.argv[2])
    rows = []
    for q in sorted(uni):
        if q in skew:
            rows.append((q, uni[q], skew[q], skew[q] / uni[q]))
    rows.sort(key=lambda r: -r[3])
    out = {
        "fixture": "ScaleGen --skew at mult=1: 30%-hot user_id, 30%-hot "
                   "source, boilerplate line on 60% of docs, 10% near-dup "
                   "cluster around doc 0",
        "queries": {q: {"uniform_s": round(u, 3), "skew_s": round(s, 3),
                        "ratio": round(r, 2)} for q, u, s, r in rows},
        "total_uniform_s": round(sum(r[1] for r in rows), 2),
        "total_skew_s": round(sum(r[2] for r in rows), 2),
        "total_ratio": round(sum(r[2] for r in rows) / sum(r[1] for r in rows), 2),
    }
    with open("SKEW_LOCAL.json", "w") as f:
        json.dump(out, f, indent=1)
    print("| query | uniform | hot-key | ratio |")
    print("|---|---|---|---|")
    for q, u, s, r in rows:
        print(f"| {q} | {u:.2f} s | {s:.2f} s | {r:.1f}x |")
    print(f"\ntotals: uniform {out['total_uniform_s']} s -> hot-key "
          f"{out['total_skew_s']} s ({out['total_ratio']}x)")


if __name__ == "__main__":
    main()
