#!/bin/bash
# Quiet-capture bench launcher: runs graft.Bench through plain `java`
# instead of sbt, so the committed BENCH_LOCAL.json is not polluted by
# sbt's own multi-core startup burn. Requires a compiled tree
# (`sbt compile` first). Flags mirror build.sbt's javaOptions.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
#     tools/run_bench.sh                     # JSON line on stdout
#   SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json   # artifact destination
#   SPARK_GRAFT_BENCH_ONLY=q02_top_orders    # filtered triage runs
# default the artifact AWAY from the committed BENCH_LOCAL.json —
# graft.Bench's own default writes into the CWD, and a filtered smoke
# run from the repo root would silently clobber the committed capture
# (it did, once). Pass SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json
# explicitly for the real committed capture.
export SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-/tmp/bench_local_$$.json}"
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
  graft.Bench
