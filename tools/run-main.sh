#!/usr/bin/env bash
# Run a graft main class off a SNAPSHOT of the compiled classes, outside
# sbt — background measurement runs must not contend for the sbt lock or
# have class files swapped under them by a concurrent compile.
# Usage: tools/run-main.sh <MainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 24g), SNAPSHOT=reuse to keep the last
#        snapshot, plus whatever the main reads (SPARK_GRAFT_*).
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
SNAP="${SNAP_DIR:-/tmp/graft-classes-snap}"
if [ "${SNAPSHOT:-}" != "reuse" ] || [ ! -d "$SNAP" ]; then
  rm -rf "$SNAP"
  cp -r "$CLASSES" "$SNAP"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize="${SPARK_CODE_CACHE:-512m}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$@"
