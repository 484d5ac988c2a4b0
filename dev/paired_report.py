#!/usr/bin/env python3
"""Pair the alternating old/new bench runs from dev/paired_roundclose.sh.

For each query: delta_i = new_i - old_i per adjacent (old_i, new_i) run
pair; report the per-query MEDIAN delta and the arm means. A query counts
as regressed/improved only when |median delta| clears both 10% of the old
mean and 0.05 s (the driver's own noise floor on sub-0.2 s queries).

Usage: python3 dev/paired_report.py <outdir>
"""
import json, sys, glob, statistics, os

d = sys.argv[1]
olds, news = [], []
for i in range(1, 100):
    po, pn = f"{d}/old_{i}.json", f"{d}/new_{i}.json"
    if not (os.path.exists(po) and os.path.exists(pn)):
        break
    olds.append(json.load(open(po))["queries"])
    news.append(json.load(open(pn))["queries"])
if not olds:
    sys.exit("no pairs found")
keys = sorted(set(olds[0]) & set(news[0]))
rows = []
for k in keys:
    deltas = sorted(n[k] - o[k] for o, n in zip(olds, news))
    med = statistics.median(deltas)
    mo = statistics.mean(o[k] for o in olds)
    mn = statistics.mean(n[k] for n in news)
    rows.append((k, mo, mn, med))
tot_o = sum(r[1] for r in rows); tot_n = sum(r[2] for r in rows)
print(f"pairs={len(olds)}  old mean total={tot_o:.1f}s  new mean total={tot_n:.1f}s  "
      f"sum of per-query median deltas={sum(r[3] for r in rows):+.1f}s")
reg = [r for r in rows if r[3] > max(0.10 * r[1], 0.05)]
imp = [r for r in rows if -r[3] > max(0.10 * r[1], 0.05)]
print(f"\nREGRESSED ({len(reg)}):")
for k, mo, mn, med in sorted(reg, key=lambda r: -r[3]):
    print(f"  {k:30s} {mo:6.2f} -> {mn:6.2f}  med {med:+.2f}")
print(f"\nIMPROVED ({len(imp)}):")
for k, mo, mn, med in sorted(imp, key=lambda r: r[3]):
    print(f"  {k:30s} {mo:6.2f} -> {mn:6.2f}  med {med:+.2f}")
