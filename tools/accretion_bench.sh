#!/bin/bash
# Per-batch LM-accretion cost law: old full-swap shape vs r16 delta
# appends + cadenced compaction, at two base model sizes, with
# end-state parity asserted. Requires a compiled tree (`sbt compile`).
#
#   tools/accretion_bench.sh [batches] [docsPerBatch] [outJson]
#   defaults: 8 2000 ACCRETION_LOCAL.json
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
  graft.tools.AccretionBench "$@"
