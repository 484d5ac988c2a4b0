#!/usr/bin/env python3
"""Compare one graft.Bench run against the BENCH_LOCAL.json band
(VERDICT r15 #8): makes the round-close regression call MECHANICAL —
"outside the committed per-query spread", not a judgment call.

Checks, in order:
  gate   -- run total <= 2.0 x anchor medianTotal (the BASELINE.md gate).
  band   -- run total <= max(anchor runTotals) x 1.10: inside the anchor's
            own intra-host noise band -> any per-query ratio is host noise
            by definition of the band.
  flags  -- queries whose time exceeds anchor-median x max(spread, 1.5)
            AND are >0.5s absolute (micro-queries churn on noise alone).
            Flags matter only when the band check failed.

Exit 0 on PASS (gate ok), 1 on gate breach. The JSON verdict goes to
stdout either way; record it in SCALING.md at round close.

Usage: dev/bench_check.py BENCH_run.json [BENCH_LOCAL.json]
"""
import json
import sys


def main() -> None:
    run_path = sys.argv[1]
    anchor_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL.json"
    run = json.load(open(run_path))
    anchor = json.load(open(anchor_path))

    total = run["value"]
    med_total = anchor["medianTotal"]
    band_top = max(anchor["runTotals"]) * 1.10
    gate_ok = total <= 2.0 * med_total
    in_band = total <= band_top

    flagged = []
    for q, sec in sorted(run["queries"].items()):
        med = anchor["queriesMedian"].get(q)
        if med is None or med <= 0:
            continue  # new query since the anchor: nothing to compare
        spread = max(anchor["queriesSpread"].get(q, 1.0), 1.5)
        if sec > med * spread and sec - med > 0.5:
            flagged.append({
                "query": q, "sec": round(sec, 2), "anchor_median": med,
                "ratio": round(sec / med, 2),
                "spread": anchor["queriesSpread"].get(q, 1.0),
            })
    flagged.sort(key=lambda f: -f["ratio"])

    verdict = (
        "PASS (inside the anchor band: host noise by construction)"
        if gate_ok and in_band else
        "PASS (gate ok; total outside the band -> read the flagged plans)"
        if gate_ok else
        "FAIL (total breaches the 2x BASELINE gate)"
    )
    print(json.dumps({
        "run_total_sec": round(total, 1),
        "anchor_median_sec": med_total,
        "anchor_band_top_sec": round(band_top, 1),
        "ratio_vs_median": round(total / med_total, 3),
        "gate_2x_ok": gate_ok,
        "inside_band": in_band,
        "flagged": flagged[:10],
        "n_flagged": len(flagged),
        "verdict": verdict,
    }, indent=1))
    sys.exit(0 if gate_ok else 1)


if __name__ == "__main__":
    main()
