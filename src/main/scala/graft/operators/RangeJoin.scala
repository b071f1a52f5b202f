package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second classic "operator Spark
  * lacks a scalable plan for": `p.key = i.key AND i.start <= p.t AND
  * p.t <= i.end` plans as BroadcastNestedLoopJoin the moment the
  * equi-key isn't selective enough, which is linear only while one
  * side fits in executor memory.
  *
  * The scale shape is bucketization: intervals explode to the coarse
  * time buckets they cover, points map to their single bucket, and the
  * non-equi predicate becomes a plain shuffled EQUI-join on
  * (key, bucket) + an exact containment filter. Cost is explicit and
  * tunable: intervals pay (length / bucketWidth + 1) rows, points pay
  * one row; pick `bucketWidth` near the median interval length. A
  * point lies in exactly one bucket, so a (point, interval) pair can
  * meet in at most one bucket — no post-join dedup.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` with the
    * same `keys` whose `[startCol, endCol]` (inclusive) contains
    * `ptCol`. All three columns must be NONNEGATIVE integers (epoch
    * seconds, token offsets, ...) — bucketing uses integer `div`, the
    * same 2^53 double-division trap q60 uncovered. Interval columns
    * arrive prefixed.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long, prefix: String = "i_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iPayload = intervals.columns.toSeq.filterNot(keys.contains)
    val iExp = intervals.select(
      keys.map(col) ++ iPayload.map(c => col(c).as(prefix + c)) :+
        explode(sequence(
          expr(s"$startCol div ${bucketWidth}L"),
          expr(s"$endCol div ${bucketWidth}L"))).as("__bucket"): _*)
    val pSide = points.withColumn("__bucket",
      expr(s"$ptCol div ${bucketWidth}L"))
    pSide.join(iExp, keys :+ "__bucket")
      .filter(col(prefix + startCol) <= col(ptCol) &&
        col(ptCol) <= col(prefix + endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: every (a, b) pair sharing `keys` whose
    * inclusive ranges intersect (`aStart ≤ b_end AND bStart ≤ a_end`).
    * Spark plans this non-equi predicate as a nested loop; here both
    * sides explode to their covered buckets and meet in a plain
    * shuffled equi-join on (key, bucket).
    *
    * An overlapping pair shares EVERY bucket of its intersection, so
    * naive bucketing duplicates it; instead of a distinct (a full
    * extra shuffle of the output), each pair is attributed to ONE
    * canonical bucket — the bucket containing the intersection's
    * start, `max(aStart, bStart) div width` — and all other meetings
    * are filtered. Exact, no dedup shuffle. Cost: each side pays
    * (length/width + 1) rows; pick `bucketWidth` near the median
    * interval length. Columns must be NONNEGATIVE integers (the
    * `div` bucketing contract above). B-side columns arrive prefixed.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
                      aStartCol: String, aEndCol: String,
                      bStartCol: String, bEndCol: String,
                      bucketWidth: Long, prefix: String = "b_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, startCol: String, endCol: String,
                 pfx: String): DataFrame = {
      val payload = df.columns.toSeq.filterNot(keys.contains)
      df.select(keys.map(col) ++ payload.map(c => col(c).as(pfx + c)) :+
        explode(sequence(
          expr(s"$startCol div ${bucketWidth}L"),
          expr(s"$endCol div ${bucketWidth}L"))).as("__bucket"): _*)
    }
    val aExp = exploded(a, aStartCol, aEndCol, "")
    val bExp = exploded(b, bStartCol, bEndCol, prefix)
    aExp.join(bExp, keys :+ "__bucket")
      .filter(col(aStartCol) <= col(prefix + bEndCol) &&
        col(prefix + bStartCol) <= col(aEndCol))
      .filter(col("__bucket") ===
        expr(s"greatest($aStartCol, $prefix$bStartCol) div ${bucketWidth}L"))
      .drop("__bucket")
  }
}
