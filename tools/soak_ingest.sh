#!/bin/bash
# Long-horizon soak of the curation-ingest streaming job through plain
# `java` (the run_bench.sh launcher recipe): ~200 real micro-batches on
# one checkpoint with a mid-soak kill/restart, asserting flat storage,
# flat lease state, monotonic offsets, and restart convergence.
# Requires a compiled tree (`sbt compile` first).
#
#   tools/soak_ingest.sh [nBatches] [outJson]    # defaults: 200 SOAK_LOCAL.json
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$(dirname "$0")/../target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.SoakIngest "$@"
