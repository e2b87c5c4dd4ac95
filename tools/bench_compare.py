#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: totals, sentinels, and per-query
movers in both directions. Usage: bench_compare.py BEFORE.json AFTER.json [N]
"""
import json, sys

def main(before_path, after_path, n=25):
    b = json.load(open(before_path))
    a = json.load(open(after_path))
    bq, aq = b["queries"], a["queries"]
    common = sorted(set(bq) & set(aq))
    print(f"total: {b['value']:.1f} -> {a['value']:.1f} s "
          f"({a['value']/b['value']:.3f}x), queries {len(bq)} -> {len(aq)}")
    print(f"sentinels before-run: {b.get('sentinel_before_s')}/{b.get('sentinel_after_s')}  "
          f"after-run: {a.get('sentinel_before_s')}/{a.get('sentinel_after_s')} "
          f"(nominal {a.get('sentinel_nominal_s')})")
    deltas = [(aq[q] - bq[q], bq[q], aq[q], q) for q in common if bq[q] > 0 and aq[q] > 0]
    ratios = sorted(deltas, key=lambda t: t[0])
    print(f"\ntop {n} improvements (delta s):")
    for d, bb, aa, q in ratios[:n]:
        print(f"  {bb:6.2f} -> {aa:5.2f}  ({d:+.2f}, {aa/bb:.2f}x)  {q}")
    print(f"\ntop {n} regressions (delta s):")
    for d, bb, aa, q in ratios[-n:][::-1]:
        if d <= 0.05: break
        print(f"  {bb:6.2f} -> {aa:5.2f}  ({d:+.2f}, {aa/bb:.2f}x)  {q}")
    med = sorted(aq[q] / bq[q] for q in common if bq[q] > 0 and aq[q] > 0)
    print(f"\nmedian per-query ratio: {med[len(med)//2]:.3f} over {len(med)} queries")
    if "shuffle_bytes" in b and "shuffle_bytes" in a:
        bs, as_ = b["shuffle_bytes"], a["shuffle_bytes"]
        tb, ta = sum(bs.values()), sum(as_.values())
        print(f"suite shuffle bytes: {tb/1e9:.2f} -> {ta/1e9:.2f} GB")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 25)
