#!/usr/bin/env python3
"""Shuffle-discipline audit over a Bench full-fidelity JSON with
"qmetrics" (per-query input / shuffle / spill bytes from the warm
pass). Prints: any query that SPILLED, the top shuffle writers with
their shuffle:input ratio, and per-family byte totals — the measured
form of SCALE.md's plan-audit claims.
Usage: shuffle_audit.py <bench_full.json> [top_n]
(dev/driver-side tooling only — not part of the engine)
"""
import json
import sys

d = json.load(open(sys.argv[1]))
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
qm = d.get("qmetrics", {})
if not qm:
    sys.exit("no qmetrics in this bench JSON (pre-round-11 Bench?)")


def mb(b):
    return f"{b / 1048576:8.1f}M"


spilled = {k: v for k, v in qm.items() if v["spillD"] or v["spillM"]}
print(f"spilled queries: {len(spilled)}")
for k, v in sorted(spilled.items(), key=lambda kv: -kv[1]["spillD"]):
    print(f"  {k:34s} mem {mb(v['spillM'])} disk {mb(v['spillD'])}")

rows = sorted(qm.items(), key=lambda kv: -kv[1]["shufW"])[:top_n]
print(f"\ntop {top_n} shuffle writers (warm pass):")
print(f"{'query':34s} {'input':>9s} {'shufW':>9s} ratio")
for k, v in rows:
    r = v["shufW"] / v["in"] if v["in"] else float("inf")
    print(f"{k:34s} {mb(v['in'])} {mb(v['shufW'])} {r:5.2f}")

import re

fams = {}
for k, v in qm.items():
    fam = re.match(r"[a-z]+", k).group()
    f = fams.setdefault(fam, [0, 0, 0])
    f[0] += v["in"]
    f[1] += v["shufW"]
    f[2] += v["spillD"]
print("\nper family (input / shuffle written / disk spill):")
for f in sorted(fams):
    i, s, sp = fams[f]
    print(f"  {f:4s} {mb(i)} {mb(s)} {mb(sp)}")
tot_i = sum(v["in"] for v in qm.values())
tot_s = sum(v["shufW"] for v in qm.values())
print(f"\ntotal input {mb(tot_i)}, total shuffle {mb(tot_s)} "
      f"({tot_s / tot_i:4.2f}x of input)")
zero = sum(1 for v in qm.values() if v["shufW"] == 0)
print(f"queries with ZERO shuffle bytes: {zero}/{len(qm)}")

# Driver-overhead attribution (r15): wall seconds vs summed executor
# run time on the warm pass. A query whose wall far exceeds its task
# time is driver-dominated (analysis/optimization/planning/fixture
# setup) — the signature that separated r14's "session pollution"
# suspicion from a plan regression. Only meaningful for bench JSONs
# whose qmetrics carry execMs (r15+).
if any("execMs" in v for v in qm.values()):
    walls = d.get("queries", {})
    gaps = []
    for k, v in qm.items():
        if "execMs" not in v:
            continue
        # wallMs is the SAME pass the executor metrics came from;
        # the top-level "queries" map is min-of-passes and must not
        # be paired with pass-2 executor time (falls back to it only
        # for artifacts predating wallMs).
        if "wallMs" in v:
            wall = v["wallMs"] / 1000.0
        elif k in walls:
            wall = walls[k]
        else:
            continue
        exec_s = v["execMs"] / 1000.0
        gaps.append((wall - exec_s, wall, exec_s, v.get("tasks", 0), k))
    gaps.sort(reverse=True)
    print(f"\ntop driver-overhead queries (wall - executor time, warm pass):")
    print(f"{'query':34s} {'wall':>7s} {'exec':>7s} {'gap':>7s} tasks")
    for gap, wall, exec_s, nt, k in gaps[:top_n]:
        print(f"{k:34s} {wall:6.2f}s {exec_s:6.2f}s {gap:6.2f}s {nt:5d}")
