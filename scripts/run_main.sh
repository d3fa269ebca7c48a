#!/usr/bin/env bash
# Drive a graft main directly on compiled classes — no sbt lock, usable
# while sbt runs tests. Mirrors build.sbt's JDK-17 add-opens + memory.
# Usage: scripts/run_main.sh <mainClass> [args...]
#   e.g. scripts/run_main.sh graft.tools.ScaleProbe /root/testdata/sf0.1 100 out.json q1,q2 /tmp/corpus heaps
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" -XX:ReservedCodeCacheSize=1g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
