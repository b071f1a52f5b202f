package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus-wide quantile BUCKETING without a global sort — the
  * curriculum/length-binning pass. `ntile(B) OVER (ORDER BY v)` is the
  * textbook formulation and a scale trap: one global window = every
  * row through a single partition. For the columns pipelines actually
  * bin on (lengths, integer scores, quality deciles) the value domain
  * is small even when the corpus is not, so exact quantiles contract
  * the same way [[BpeFit.wordCounts]] does:
  *
  *  - ONE corpus-sized groupBy(value) → (value, count) — the only
  *    shuffle that scales with data;
  *  - the cumulative rank runs over the VALUE-distinct table (10^2-10^5
  *    rows at 100 TB — a deliberate, documented single-partition window
  *    over a provably tiny table);
  *  - thresholds broadcast back; assignment is scan-level arithmetic.
  *
  * Ties get ONE bucket (assignment is a pure function of the value):
  * unlike ntile, two equal documents can never land in different
  * buckets across engines, partitionings, or reruns — that
  * determinism is what makes the result oracle-checkable at all.
  *
  * The tiny-table premise is GUARDED, not assumed: a cheap
  * `approx_count_distinct` pre-pass (no shuffle beyond partial HLL
  * merge) checks the value domain against `maxDistinct`. A continuous
  * DOUBLE column blows the premise — the "tiny" window would be
  * corpus-sized, the exact ntile trap this operator exists to avoid —
  * so above the bound thresholds fall back to the mergeable
  * Greenwald-Khanna sketch (`percentile_approx`, rank error ≤
  * 1/accuracy), which never concentrates rows on one task.
  */
object Quantiles {

  /** Value-domain bound for the exact path; above it (HLL estimate,
    * ±~2%) thresholds come from `percentile_approx`. 10^5 matches the
    * documented envelope of binnable columns.
    */
  val DefaultMaxDistinct: Long = 100000L

  /** Bucket thresholds: for k = 1..buckets-1, the smallest value whose
    * cumulative count reaches ceil(k·n/buckets) — one row
    * (k, threshold). Integer rank arithmetic only on the exact path;
    * GK-sketch quantiles past `maxDistinct` distinct values (see
    * object scaladoc).
    */
  def valueThresholds(df: DataFrame, valueCol: String, buckets: Int,
                      maxDistinct: Long = DefaultMaxDistinct,
                      sketchAccuracy: Int = 10000): DataFrame = {
    val est = df.agg(approx_count_distinct(col(valueCol)).as("d")).head.getLong(0)
    if (est > maxDistinct) sketchThresholds(df, valueCol, buckets, sketchAccuracy)
    else {
      val counts = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
      // tiny table: distinct values only (guarded above) — the window
      // is intentionally unpartitioned here and nowhere else
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      cum.crossJoin(
          df.sparkSession.range(1, buckets).select(col("id").as("k")))
        .filter(col("cum") * buckets >= col("k") * col("n"))
        .groupBy(col("k")).agg(min(col("v")).as("threshold"))
    }
  }

  /** Continuous-domain fallback: thresholds from one mergeable GK
    * sketch pass — same (k, threshold) shape, approximate ranks
    * (error ≤ 1/accuracy), no per-value table, no global window.
    */
  def sketchThresholds(df: DataFrame, valueCol: String, buckets: Int,
                       accuracy: Int = 10000): DataFrame = {
    val ps = array((1 until buckets).map(k => lit(k.toDouble / buckets)): _*)
    df.agg(percentile_approx(col(valueCol), ps, lit(accuracy)).as("ts"))
      .select(posexplode(col("ts")).as(Seq("pos", "threshold")))
      .select((col("pos") + 1).cast("long").as("k"), col("threshold"))
  }

  /** Assign every row its quantile bucket in [1, buckets]: 1 + the
    * number of thresholds strictly below the value. The threshold set
    * is buckets-1 rows — broadcast by construction; assignment adds no
    * shuffle to the scan.
    */
  def bucketAssign(df: DataFrame, valueCol: String, buckets: Int,
                   maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    val th = valueThresholds(df, valueCol, buckets, maxDistinct)
      .agg(collect_list(struct(col("k"), col("threshold"))).as("ths"))
      .select(col("ths"))
    df.crossJoin(broadcast(th))
      .withColumn("bucket",
        (lit(1) + aggregate(col("ths"), lit(0),
          (acc, t) => acc + when(col(valueCol) > t.getField("threshold"), 1)
            .otherwise(0))).cast("int"))
      .drop("ths")
  }
}
