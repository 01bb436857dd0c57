#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars without
# sbt's startup overhead. Usage: scripts/run.sh graft.Verify <sfDir> <outDir>
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# SPARK_GRAFT_JAVA_OPTS: extra JVM flags (e.g. -Dspark.eventLog.enabled=true
# for the stage-latency audit — scripts/stage_audit.py)
exec java $OPENS -Xmx8g ${SPARK_GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dderby.stream.error.file=/tmp/derby.log \
  -cp "$CP" "$@"
