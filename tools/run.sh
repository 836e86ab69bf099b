#!/usr/bin/env bash
# Run a graft main class against the compiled classes + /opt/spark/jars
# without going through sbt (no build-lock contention with a test run).
# Usage: tools/run.sh [-mMEM] <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
if [[ "${1:-}" == -m* ]]; then MEM="${1#-m}"; shift; fi
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
