package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark as `hll_sketch_agg`/`hll_union_agg`) — the 100 TB shape
  * for distinct counts a single pass can't hold:
  *
  *  - build ONE compact sketch per shard/partition/day (map-side
  *    partial aggregation applies — sketches merge associatively, so
  *    the shuffle carries ~lgK-sized binaries, never member sets);
  *  - store them beside the shard (they are just binary columns);
  *  - answer any later rollup (per week, per corpus, per source) by
  *    UNIONING stored sketches — no rescan of the data that built them.
  *
  * Versus `approx_count_distinct` (HLL++ that emits only the final
  * number), the sketch column is reusable and re-aggregable — the
  * property training-data bookkeeping actually needs (vocab growth,
  * per-shard user coverage, cross-dump overlap estimation via
  * inclusion–exclusion).
  */
object Sketches {

  /** One mergeable sketch of `valueCol`'s distinct values per group.
    * lgK trades size for accuracy: 12 → ~2.5 KB per sketch, ~1.6% RSE.
    */
  def sketchBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll stored sketches up to a coarser grouping and estimate. */
  def unionEstimate(sketches: DataFrame, groupCols: Seq[String],
                    lgK: Int = 12): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    grouped.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("distinct_estimate"))
  }

  /** Estimated overlap of two sketch columns by inclusion–exclusion:
    * |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B). Negative noise clamps to 0.
    */
  def overlapEstimate(a: Column, b: Column): Column =
    greatest(lit(0L),
      (hll_sketch_estimate(a) + hll_sketch_estimate(b) -
        hll_sketch_estimate(hll_union(a, b, allowDifferentLgConfigK = false))).cast("long"))

  /** One mergeable FREQUENCY sketch per group — Spark's built-in
    * `count_min_sketch` aggregate (estimate ≥ true; ≤ true + ε·N with
    * probability `confidence`). Same storage recipe as [[sketchBy]]:
    * binary column beside the shard, re-aggregable forever.
    */
  def cmsBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
            eps: Double = 0.001, confidence: Double = 0.99,
            seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Roll stored frequency sketches up to a coarser grouping
    * ([[graft.functions.CmsSketch.cms_union]] — the seam Spark lacks);
    * probe with `cms_estimate(cms, item)`.
    */
  def cmsUnion(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    grouped.agg(graft.functions.CmsSketch.cms_union(col("cms")).as("cms"))
  }
}
