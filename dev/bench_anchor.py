#!/usr/bin/env python3
"""Assemble BENCH_LOCAL.json from N full graft.Bench runs (VERDICT r14 #6).

Each Bench run already reports the per-query MEDIAN of 3 in-process reps;
this script folds N such runs into a DISTRIBUTION anchor so future rounds
compare against a band, not a lucky point:

  queries       -> per-query BEST of the N runs (the comparable point —
                   the shape prior BENCH_LOCALs carried)
  queriesMedian -> per-query median across runs
  queriesSpread -> per-query max/min ratio across runs (the host-noise
                   band a future delta must exceed to mean anything)

Usage: dev/bench_anchor.py out.json run1.json run2.json [run3.json ...]
"""
import json
import statistics
import sys


def main() -> None:
    out, *runs = sys.argv[1:]
    datas = [json.load(open(p)) for p in runs]
    names = sorted(datas[0]["queries"])
    best, med, spread = {}, {}, {}
    for q in names:
        xs = [d["queries"][q] for d in datas if d["queries"].get(q, -1) > 0]
        best[q] = round(min(xs), 3)
        med[q] = round(statistics.median(xs), 3)
        spread[q] = round(max(xs) / min(xs), 3)
    anchor = {
        "metric": "total",
        "unit": "sec",
        "value": round(sum(best.values()), 1),
        "sf": datas[0].get("sf"),
        "protocol": (
            f"best-of-{len(datas)} full runs (each query already a "
            "median of 3 in-process reps), captured back-to-back on a "
            "quiet host; queriesSpread is the per-query max/min across "
            "runs — the noise band a regression must exceed"
        ),
        "runTotals": [round(d["value"], 1) for d in datas],
        "medianTotal": round(sum(med.values()), 1),
        "queries": best,
        "queriesMedian": med,
        "queriesSpread": spread,
    }
    with open(out, "w") as f:
        json.dump(anchor, f, indent=1, sort_keys=True)
    sp = sorted(spread.values())
    print(f"runs={anchor['runTotals']} bestTotal={anchor['value']} "
          f"medianTotal={anchor['medianTotal']} "
          f"spread median={sp[len(sp)//2]} p90={sp[int(len(sp)*0.9)]}")


if __name__ == "__main__":
    main()
