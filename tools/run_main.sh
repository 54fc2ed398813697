#!/usr/bin/env bash
# Run a graft main directly with java (no sbt lock): mirrors build.sbt's
# forked-JVM flags. Usage: tools/run_main.sh graft.Bench [args...]
set -euo pipefail
# GRAFT_CLASSES overrides the classes dir (e.g. a frozen snapshot while a
# long bench chain must keep seeing one fixed key surface)
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
