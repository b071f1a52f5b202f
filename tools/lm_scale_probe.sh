#!/bin/bash
# Fixed-model LM-scoring scale probe (graft.tools.LmScaleProbe) through
# plain `java` (the run_bench.sh launcher recipe). Requires a compiled
# tree (`sbt compile`).
#
#   tools/lm_scale_probe.sh [maxDocs] [outJson]
#   defaults: 8000000 LM_SCALE_LOCAL.json
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
  graft.tools.LmScaleProbe "$@"
