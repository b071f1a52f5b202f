package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout control for curated corpora — at 100 TB the WRITE
  * layout is a query-plan decision: hive-style partitions make
  * downstream slice scans (one lang, one split) partition-pruned;
  * bucketing by doc_id makes every later doc-id join (dedup fetches,
  * span lookups, incremental admission) exchange-free on the stored
  * side; `maxRecordsPerFile` bounds file sizes so a skewed partition
  * can't produce multi-GB files (the small-files/huge-files tradeoff
  * is explicit, not accidental).
  *
  * This is the terminal sink of the curation pipeline: what q49
  * decides, this writes.
  */
object CorpusLayout {

  /** Write `df` as a partitioned + bucketed + sorted managed table.
    * `partitionCols` must be low-cardinality (lang, source, split);
    * `bucketCol` the join key downstream reads use.
    */
  def writeCurated(df: DataFrame, table: String,
                   partitionCols: Seq[String], bucketCol: String,
                   buckets: Int = 32, maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** A pruned slice read: only the matching partitions' files are
    * listed/scanned (assert via plan PartitionFilters).
    */
  def readSlice(spark: SparkSession, table: String,
                partitionCol: String, value: String): DataFrame =
    spark.table(table).filter(col(partitionCol) === value)

  /** Compaction planning — the reference's bytes-threshold batching
    * (`batchOperations.js` sizeTrigger: files accumulate until the
    * configured byte budget tips, then the batch rotates) re-expressed
    * as an offline, deterministic assignment: within each group, order
    * items by a unique key, take the exact running byte total, and cut
    * a bin every `targetBytes` — `bin = ⌊(cumBytes − size) / target⌋`
    * puts each item in the bin its FIRST byte lands in (an item
    * straddling a boundary stays with the bin it started filling, the
    * reference's rotate-AFTER-append semantic; an item ≥ target fills
    * bins alone).
    *
    * Scale path: the running total is [[Ranking.slicedCumsum]] — the
    * group's order domain is sliced by sampled quantile bounds, the
    * per-slice offsets are tiny and broadcast, and the only window
    * sorts one slice of one group per task. No global sort, no
    * single-task group scan, exact at any skew. Output is the input
    * plus `cum_bytes` (inclusive running total) and `bin` (0-based
    * within the group).
    *
    * Determinism contract: `orderCol` must be unique within a group
    * (tied orders would make the running sum — and thus bins —
    * ambiguous on ANY engine).
    */
  def planCompaction(df: DataFrame, groupCols: Seq[String],
                     orderCol: String, sizeCol: String,
                     targetBytes: Long, slices: Int = 32): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    Ranking.slicedCumsum(df, groupCols, orderCol, sizeCol, slices)
      .withColumnRenamed("__cum", "cum_bytes")
      .withColumn("bin",
        floor((col("cum_bytes") - col(sizeCol).cast("long"))
          / lit(targetBytes)).cast("bigint"))
  }

  /** Z-order (Morton) interleave key over two non-negative integer
    * dimensions — the multi-dimensional layout complement to
    * [[writeCurated]]'s single-key bucketing: range-sorting on the
    * z-key clusters BOTH dimensions at once, so files carry narrow
    * min/max envelopes on each and a predicate on EITHER dimension
    * prunes (the Delta/Iceberg OPTIMIZE ZORDER recipe, built from
    * Morton's 1966 interleave — public algorithm, original code).
    *
    * Pure codegen'd bit arithmetic: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1 (2·bits literal terms, whole-stage-codegen
    * friendly, no UDF). Inputs must fit in `bits` bits — values are
    * masked, so out-of-range bits are DROPPED (clamp upstream if the
    * domain can exceed the budget). bits ≤ 31 keeps the key in a
    * signed 64-bit.
    */
  def zOrderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int): org.apache.spark.sql.Column =
    zOrderKeyN(Seq(a, b), bits)

  /** N-dimensional Morton interleave: bit i of dimension d lands at
    * key position `i·|dims| + d`, so the 2-dim form is the
    * `dims = Seq(a, b)` special case (q115's oracle replays exactly
    * this expansion). Same literal-codegen-terms construction — d·bits
    * shift/mask/scale terms summed, no UDF; `|dims|·bits ≤ 62` keeps
    * the key in a signed 64-bit. Values are masked to `bits` bits
    * (clamp upstream if the domain can exceed the budget).
    */
  def zOrderKeyN(dims: Seq[org.apache.spark.sql.Column],
                 bits: Int): org.apache.spark.sql.Column = {
    require(dims.nonEmpty, "need at least one dimension")
    require(bits >= 1 && dims.size * bits <= 62,
      s"need 1 <= bits and ${dims.size} dims x $bits bits <= 62")
    val d = dims.size
    (for (i <- 0 until bits; c <- dims.indices) yield
      shiftright(dims(c).cast("long"), i).bitwiseAND(1L) *
        lit(1L << (i * d + c))
    ).reduce(_ + _)
  }

  /** Zone-map (min/max data-skipping) statistics per storage bucket:
    * the per-file footer stats every parquet reader keeps, surfaced as
    * a table — `(bucket, n_rows, min_v, max_v)`. One hash aggregate
    * over the (bucket, value) projection; `bucketCol` is whatever
    * models the file/rowgroup assignment (a partition expression, a
    * [[planCompaction]] bin, a [[zOrderKey]] range).
    */
  def zonemapProfile(df: DataFrame, bucketCol: org.apache.spark.sql.Column,
                     valueCol: org.apache.spark.sql.Column): DataFrame =
    df.select(bucketCol.as("bucket"), valueCol.cast("long").as("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))

  /** Data-skipping WHAT-IF: for each closed predicate range [lo, hi],
    * exactly how much would this layout's zone maps prune? Per range:
    *   buckets_total / buckets_touched  (a bucket is touched iff its
    *       [min, max] envelope overlaps the range — the pruning rule
    *       every zone-map reader applies),
    *   rows_total / rows_scanned (rows inside touched buckets — what
    *       the engine READS) / rows_matched (what it KEEPS).
    * rows_scanned/rows_matched is the layout's read amplification for
    * that predicate; a sorted layout gives ≈1, a random layout makes
    * every bucket touched — THE argument for [[zOrderKey]]/sort-on-
    * write, measured instead of asserted.
    *
    * One pass: the per-bucket aggregate computes the zone map AND one
    * conditional count per range (ranges are literals — k codegen'd
    * sums, no row multiplication); a 1-row fold per range then sums
    * the touched buckets. Nulls in `valueCol` are counted in
    * `rows_total` but match no range and never widen an envelope (a
    * null-only bucket's envelope is empty — untouchable, exactly like
    * parquet's null-aware footer stats).
    */
  def pruneEstimate(df: DataFrame, bucketCol: org.apache.spark.sql.Column,
                    valueCol: org.apache.spark.sql.Column,
                    ranges: Seq[(Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "need at least one predicate range")
    ranges.foreach { case (lo, hi) =>
      require(lo <= hi, s"range [$lo, $hi] is empty") }
    val matchCounts = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      sum(when(col("__v").between(lo, hi), 1L).otherwise(0L)).as(s"__m$i")
    }
    val baseAggs = Seq(
      min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
    val zm = df.select(bucketCol.as("bucket"), valueCol.cast("long").as("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), baseAggs ++ matchCounts: _*)
    ranges.zipWithIndex.map { case ((lo, hi), i) =>
      val touched = col("max_v").isNotNull &&
        col("max_v") >= lo && col("min_v") <= hi
      zm.agg(
          count(lit(1)).as("buckets_total"),
          sum(when(touched, 1L).otherwise(0L)).as("buckets_touched"),
          sum(col("n_rows")).cast("long").as("rows_total"),
          sum(when(touched, col("n_rows")).otherwise(0L)).cast("long")
            .as("rows_scanned"),
          sum(col(s"__m$i")).cast("long").as("rows_matched"))
        .select(lit(lo).as("lo"), lit(hi).as("hi"),
          col("buckets_total"), col("buckets_touched"),
          col("rows_total"), col("rows_scanned"), col("rows_matched"))
    }.reduce(_.unionByName(_))
  }
}
