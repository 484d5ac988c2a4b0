#!/usr/bin/env bash
# Round-close paired regression protocol (VERDICT r16 item 7): alternate
# full-suite Bench runs between the PREVIOUS round's binary (old worktree)
# and the current tree, O,N,O,N,... with SPARK_GRAFT_BENCH_REPS=1, so this
# host's multi-minute ±50% noise waves hit both arms nearly equally; pair
# per query across each adjacent (O,N) run and report the median delta.
#   Usage: dev/paired_roundclose.sh <old_tree> <pairs> <outdir>
set -euo pipefail
OLD=$1; PAIRS=$2; OUT=$3
mkdir -p "$OUT"
for i in $(seq 1 "$PAIRS"); do
  (cd "$OLD" && SPARK_GRAFT_BENCH_REPS=1 dev/jrun.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/old_$i.json")
  (SPARK_GRAFT_BENCH_REPS=1 dev/jrun.sh graft.Bench 2>/dev/null | tail -1 > "$OUT/new_$i.json")
  echo "pair $i done"
done
