#!/usr/bin/env python3
"""Compare two Bench full-fidelity JSONs (per-query seconds) and print
ratio-sorted deltas — the SCALE.md sweep analysis (round 11: sf0.1 vs
sf1). Usage: compare_bench.py <base.json> <scaled.json> [ratio_floor]
(dev/driver-side tooling only — not part of the engine)
"""
import json
import sys

base = json.load(open(sys.argv[1]))["queries"]
scal = json.load(open(sys.argv[2]))["queries"]
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
rows = []
for k in sorted(scal):
    if k in base and base[k] > 0:
        rows.append((scal[k] / base[k], base[k], scal[k], k))
rows.sort(reverse=True)
fams = {}
for r, b, s, k in rows:
    fam = k.split("_")[0].rstrip("0123456789")
    if len(k.split("_")[0]) > 3 and k.startswith("t19"):
        fam = "t"
    fams.setdefault(fam, [0.0, 0.0])
    fams[fam][0] += b
    fams[fam][1] += s
print(f"{'query':34s} {'base':>7s} {'scaled':>8s} {'ratio':>6s}")
for r, b, s, k in rows:
    if r >= floor:
        print(f"{k:34s} {b:7.2f} {s:8.2f} {r:6.1f}x")
print("\nper family (sum of seconds):")
for f in sorted(fams):
    b, s = fams[f]
    print(f"  {f:4s} {b:8.2f} -> {s:8.2f}  ({s/b:5.1f}x)")
tb = sum(v for v in base.values())
ts = sum(v for v in scal.values())
print(f"\ntotal: {tb:.1f}s -> {ts:.1f}s ({ts/tb:.1f}x) over {len(rows)} common queries")
