#!/bin/bash
# Run a graft main class with the compiled classes + Spark jars (fast path,
# no sbt startup). Usage: tools/run.sh graft.Verify /root/testdata/sf0.001 /tmp/out
set -e
cd "$(dirname "$0")/.."
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# default heap = half of RAM clamped to [4g, 24g]; SPARK_DRIVER_MEM overrides
DEFAULT_HEAP=$(awk '/MemTotal/ {g=int($2/2097152); if (g<4) g=4; if (g>24) g=24; print g"g"}' /proc/meminfo 2>/dev/null)
DEFAULT_HEAP=${DEFAULT_HEAP:-8g}   # no /proc/meminfo or no MemTotal line
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-$DEFAULT_HEAP} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
