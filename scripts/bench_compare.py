#!/usr/bin/env python3
"""Compare two bench artifacts against the round-6 done-criterion:
every query's median must agree within RATIO_LIMIT (default 1.5x)
between two consecutive full-board runs of identical code.

Usage: python3 scripts/bench_compare.py A.json B.json [ratio_limit]

Prints per-query offenders (worst first), the totals ratio, and the
recorded load averages of each artifact (a contaminated run — one that
overlapped another heavyweight process — is visible there). Exit code 0
iff all shared queries agree within the limit.
"""
import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    limit = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    rows = []
    for q in shared:
        x, y = qa[q], qb[q]
        ratio = max(x, y) / max(min(x, y), 1e-9)
        rows.append((ratio, q, x, y))
    rows.sort(reverse=True)
    # supporting view: the per-query MIN across passes (spread[q][0]) is
    # a one-sided bound on true cost and converges faster than the
    # median on a noisy box — report its agreement too
    mins = []
    for q in shared:
        x, y = a["spread"][q][0], b["spread"][q][0]
        mins.append((max(x, y) / max(min(x, y), 1e-9), q))
    min_over = sum(1 for r in mins if r[0] > limit)
    # CPU-seconds view (artifacts of Bench >= r10): per-query process CPU
    # is load-insensitive, so agreement here PROVES the two runs executed
    # identical plans even when wall time drifted with box load
    cpu_rows = []
    if "cpu" in a and "cpu" in b:
        for q in shared:
            x, y = a["cpu"].get(q, -1), b["cpu"].get(q, -1)
            if x > 0 and y > 0:
                cpu_rows.append((max(x, y) / max(min(x, y), 1e-9), q, x, y))
        cpu_rows.sort(reverse=True)
    offenders = [r for r in rows if r[0] > limit]
    print(f"artifacts: {a_path} ({a.get('value')}s, load={a.get('load_avg')}) "
          f"vs {b_path} ({b.get('value')}s, load={b.get('load_avg')})")
    tot_ratio = max(a["value"], b["value"]) / min(a["value"], b["value"])
    print(f"totals ratio: {tot_ratio:.3f}x over {len(shared)} shared queries")
    if only_a or only_b:
        print(f"non-shared queries ignored: only-in-A={only_a} only-in-B={only_b}")
    print(f"\nworst 10 per-query ratios (limit {limit}x):")
    for ratio, q, x, y in rows[:10]:
        flag = " <-- OVER" if ratio > limit else ""
        print(f"  {q:38s} {x:7.3f}s vs {y:7.3f}s  {ratio:5.2f}x{flag}")
    print(f"min-statistic view: {min_over} queries exceed {limit}x "
          f"(worst {max(mins)[0]:.2f}x {max(mins)[1]})")
    if cpu_rows:
        ta = sum(r[2] for r in cpu_rows)
        tb = sum(r[3] for r in cpu_rows)
        # per-query CPU is process-wide (background JIT threads bill to
        # whichever sub-second query runs), so per-query ratios are only
        # meaningful above ~1s of CPU; the totals ratio is the
        # plan-identity statistic
        big = [r for r in cpu_rows if min(r[2], r[3]) >= 1.0]
        cpu_over = sum(1 for r in big if r[0] > limit)
        worst = max(big) if big else max(cpu_rows)
        print(f"cpu-seconds view: totals {ta:.1f}s vs {tb:.1f}s "
              f"({max(ta, tb) / min(ta, tb):.3f}x), {cpu_over} of "
              f"{len(big)} >=1s-cpu queries exceed {limit}x "
              f"(worst {worst[0]:.2f}x {worst[1]})")
    if offenders:
        print(f"\nFAIL: {len(offenders)} queries exceed {limit}x")
        return 1
    print(f"\nPASS: all {len(shared)} queries within {limit}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
