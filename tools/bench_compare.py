#!/usr/bin/env python3
"""Compare two bench_full JSON artifacts (same harness): per-query warm
seconds, total, and geomean speedup. Usage:

    python3 tools/bench_compare.py bench_baseline_r18pre.json bench_full_r18.json
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def warm_map(art):
    out = {}
    for name, row in art.get("queries", art).items():
        if isinstance(row, dict):
            w = row.get("warm", row.get("sec"))
        else:
            w = row
        if w is not None:
            out[name] = float(w)
    return out


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    wa, wb = warm_map(a), warm_map(b)
    shared = sorted(set(wa) & set(wb))
    ratios = []
    rows = []
    for q in shared:
        x, y = wa[q], wb[q]
        if x > 0 and y > 0:
            ratios.append(x / y)
        rows.append((x / max(y, 1e-9), q, x, y))
    rows.sort(reverse=True)
    print(f"shared queries: {len(shared)}")
    ta, tb = sum(wa[q] for q in shared), sum(wb[q] for q in shared)
    print(f"warm total: {ta:.2f} -> {tb:.2f}  ({ta / tb:.2f}x)")
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    print(f"geomean speedup: {gm:.3f}x")
    print("\ntop movers (speedup, query, before, after):")
    for r, q, x, y in rows[:20]:
        print(f"  {r:6.2f}x  {q:40s} {x:7.2f} -> {y:7.2f}")
    print("\nbottom movers:")
    for r, q, x, y in rows[-10:]:
        print(f"  {r:6.2f}x  {q:40s} {x:7.2f} -> {y:7.2f}")


if __name__ == "__main__":
    main()
