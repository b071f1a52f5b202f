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
}
