#!/bin/bash
# Run a graft main class directly (no sbt startup/lock): tools/run_main.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) mirrors build.sbt's javaOptions.
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
MEM="${SPARK_DRIVER_MEM:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" $EXTRA_JAVA_OPTS "$@"
