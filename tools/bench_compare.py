#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: common-query sums, movers, new queries.

Usage: bench_compare.py OLD.json NEW.json [mover_threshold=1.4]
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so, sn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(f"common {len(common)} queries: {so:.2f}s -> {sn:.2f}s "
          f"({sn / so:.2f}x)")
    movers = [(q, qo[q], qn[q]) for q in common
              if qn[q] > thr * qo[q] and qn[q] - qo[q] > 0.15]
    fasters = [(q, qo[q], qn[q]) for q in common
               if qo[q] > thr * qn[q] and qo[q] - qn[q] > 0.15]
    for q, a, b in sorted(movers, key=lambda x: x[2] / x[1], reverse=True):
        print(f"  SLOWER {q}: {a:.2f} -> {b:.2f} ({b / a:.2f}x)")
    for q, a, b in sorted(fasters, key=lambda x: x[1] / x[2], reverse=True):
        print(f"  faster {q}: {a:.2f} -> {b:.2f} ({b / a:.2f}x)")
    for q in sorted(set(qn) - set(qo)):
        print(f"  new    {q}: {qn[q]:.2f}s")
    for q in sorted(set(qo) - set(qn)):
        print(f"  gone   {q}: was {qo[q]:.2f}s")
    print(f"totals: old {old.get('value'):.2f}s "
          f"({len(qo)}q, load {old.get('loadavg_start')}) | "
          f"new {new.get('value'):.2f}s "
          f"({len(qn)}q, load {new.get('loadavg_start')})")


if __name__ == "__main__":
    main()
