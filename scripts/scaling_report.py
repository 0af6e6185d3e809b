#!/usr/bin/env python3
"""Build docs/scaling.md's measured table: per-query seconds at sf0.1
(median-of-3, bench_local.json) vs sf1 (10x data, single rep), with the
time ratio. Usage: scaling_report.py bench_local.json /tmp/bench_sf1.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    qs, qb = small["queries"], big["queries"]
    shared = [q for q in qs if q in qb]
    rows = []
    for q in shared:
        s, b = qs[q], qb[q]
        rows.append((q, s, b, b / s if s > 0 else float("inf")))
    rows.sort(key=lambda r: -r[2])
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"| query | sf0.1 s | sf1 s | ratio (10x data) |")
    print(f"|---|---|---|---|")
    for q, s, b, r in rows[:20]:
        print(f"| {q} | {s:.2f} | {b:.2f} | {r:.1f}x |")
    print()
    print(f"TOTAL shared={len(rows)} sf0.1={tot_s:.1f}s sf1={tot_b:.1f}s "
          f"ratio={tot_b / tot_s:.2f}x")
    sub = sum(1 for r in rows if r[3] <= 10.0)
    print(f"queries at-or-below linear (<=10x): {sub}/{len(rows)}")
    worst = [r for r in rows if r[3] > 12.0 and r[2] > 1.0]
    print(f"super-linear outliers (>12x and >1s at sf1): "
          f"{[(q, round(rr, 1)) for q, _, _, rr in worst]}")


if __name__ == "__main__":
    main()
