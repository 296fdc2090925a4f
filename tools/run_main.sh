#!/usr/bin/env bash
# Run a graft main (graft.Verify / graft.Bench) with plain `java`,
# bypassing sbt — lets a long background drive (the sf1 cluster-profile
# oracle dump takes ~an hour) run while sbt stays free for compiles and
# the test suite. Mirrors build.sbt's forked-JVM options exactly
# (JDK17 add-opens, UTC, no UI, SPARK_DRIVER_MEM heap,
# GRAFT_EXTRA_JVM_OPTS passthrough). Compile first: sbt -batch compile.
#
# Usage: tools/run_main.sh graft.Verify /tmp/sf1 /tmp/verify_cluster
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# shellcheck disable=SC2086
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  ${GRAFT_EXTRA_JVM_OPTS:-} \
  -cp "$CP" "$@"
