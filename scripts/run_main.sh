#!/bin/bash
# Run a graft main class directly on the JVM (bypasses sbt, whose
# supervisor JVM burns ~2.5 cores and taints benchmark timings).
# Usage: run_main.sh <mainClass> [args...]
set -e
CLASSES=/root/repo/target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -XX:ReservedCodeCacheSize=1g \
  -Xmx${SPARK_DRIVER_MEM:-16g} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
