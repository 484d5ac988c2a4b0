#!/usr/bin/env python3
"""Merge the scaling-campaign bench JSONs and compute per-query growth.

Inputs (produced by /tmp/scale/campaign.sh):
  b001.json   full suite at sf0.01        (driver testdata)
  b01.json    full suite at sf0.1         (driver testdata)
  b01s.json   full suite at synth-sf0.1   (ScaleSynth from sf0.01 — calibration)
  b1_*.json   chunked suite at synth-sf1  (ScaleSynth from sf0.1)

Output: markdown table rows + a JSON blob for SCALING.md.

Growth metric: r10 = t(sf1) / t(sf0.1) for a 10x data step. A perfectly
linear query has r10 <= 10; fixed per-query overhead (session, planning,
small-stage latency) keeps real small-scale ratios well under that. We flag
r10 > 12 as superlinear-suspect (20% tolerance over linear).
"""
import json, glob, sys, os

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale"

def load(tag):
    out = {}
    for p in glob.glob(f"{D}/{tag}.json") + glob.glob(f"{D}/{tag}_*.json"):
        with open(p) as f:
            line = f.read().strip()
        if not line:
            continue
        d = json.loads(line)
        for k, v in d["queries"].items():
            if v >= 0:
                out[k] = v
    return out

b001, b01, b01s, b1 = load("b001"), load("b01"), load("b01s"), load("b1")
names = sorted(set(b001) & set(b01) & set(b1))
fam = lambda n: ("relational" if n.startswith("q") else
                 "dedup" if n.startswith("dd") else
                 "ann" if n.startswith("ann") else
                 "text" if n.startswith("tx") else "multimodal")

rows = []
for n in names:
    r_small = b01[n] / b001[n] if b001.get(n) else None
    r10 = b1[n] / b01[n]
    calib = (b01s[n] / b01[n]) if n in b01s and b01.get(n) else None
    rows.append({
        "query": n, "family": fam(n),
        "t001": b001[n], "t01": b01[n], "t01s": b01s.get(n), "t1": b1[n],
        "r_small": round(r_small, 2) if r_small else None,
        "r10": round(r10, 2),
        "calib": round(calib, 2) if calib else None,
        "flag": "SUPERLINEAR?" if r10 > 12 else ""})

rows.sort(key=lambda r: -r["r10"])
tot001 = sum(b001[n] for n in names)
tot01 = sum(b01[n] for n in names)
tot1 = sum(b1[n] for n in names)

print(f"queries: {len(names)}  totals: sf0.01={tot001:.1f}s sf0.1={tot01:.1f}s "
      f"synth-sf1={tot1:.1f}s  suite r10={tot1/tot01:.2f}")
print()
print("| query | family | sf0.01 | sf0.1 | synth-sf1 | r(0.01→0.1) | r(0.1→1) | flag |")
print("| --- | --- | --- | --- | --- | --- | --- | --- |")
for r in rows:
    print(f"| {r['query']} | {r['family']} | {r['t001']:.3f} | {r['t01']:.3f} "
          f"| {r['t1']:.3f} | {r['r_small']} | {r['r10']} | {r['flag']} |")

with open(f"{D}/scaling.json", "w") as f:
    json.dump({"rows": rows, "totals": {"sf0.01": tot001, "sf0.1": tot01,
               "synth_sf1": tot1}}, f, indent=1)
print(f"\nwrote {D}/scaling.json", file=sys.stderr)
