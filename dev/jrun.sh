#!/usr/bin/env bash
# Run a graft main class in a fresh bare JVM (no sbt startup): the scaling /
# stress campaigns launch many short chunked JVMs, and sbt's ~30 s launch tax
# would dominate. Mirrors build.sbt's fork options (JDK17 add-opens, UTC, UI
# off). Heap via JRUN_MEM (default 8g, the bench JVM's size).
#
# Usage: dev/jrun.sh <mainClass> [args...]
#   e.g. SPARK_GRAFT_SF_DIR=/tmp/scale/sf1 dev/jrun.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=(java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
OPENARGS=()
for p in "${OPENS[@]}"; do OPENARGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPENARGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${JRUN_MEM:-8g}" -cp "$CP" "$@"
