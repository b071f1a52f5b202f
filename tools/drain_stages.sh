#!/bin/bash
# Per-stage decomposition of the one-shot drain (admission chain split,
# each stage isolated over materialized inputs) through plain `java`
# (the run_bench.sh launcher recipe). Requires a compiled tree (`sbt compile`).
#
#   tools/drain_stages.sh [docsCount] [outJson] [--skipAb]
#   defaults: 500000 DRAIN_STAGES_LOCAL.json; --skipAb skips the
#   old/new-shape A/B (for 8M+ scale-law runs where the pre-r15 shape
#   would dominate the wall clock)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "$(dirname "$0")/../target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.DrainStages "$@"
