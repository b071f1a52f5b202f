package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — the canonical "operator Spark
  * lacks": each left row picks the latest right row at-or-before its
  * timestamp (backward; `forward` symmetric), per key. kdb's `aj`,
  * pandas' `merge_asof`, DuckDB's `ASOF JOIN`.
  *
  * The distributed shape is NOT a range join (a per-row right-side
  * range scan explodes at scale) but the union-and-carry pattern: tag
  * both inputs, union them — one table whose only wide column is the
  * right payload struct (null on left rows) — then one window per key
  * ordered by (ts, side) carries the last non-null payload forward
  * onto every left row. Cost: ONE shuffle of left+right on the key
  * (the same exchange any keyed join pays), one sort within
  * partitions, zero duplication of either side. Window frames with
  * `last(ignoreNulls)` over unbounded-preceding are O(1) running
  * state per partition, not O(frame) rescans.
  *
  * Right-side ties on (key, ts) are regularized before the union
  * (greatest `tieCol` wins) so results are deterministic across
  * engines and partitionings — DuckDB's ASOF leaves the choice
  * unspecified; this operator pins it.
  */
object AsofJoin {

  /** Backward as-of: latest right row with `right.ts <= left.ts`, per
    * `keys`. Left columns pass through; the matched right `payload`
    * columns arrive as `<prefix><name>` (null when the key has no
    * right row at or before the left timestamp).
    *
    * @param tieCol right-side tie-breaker on equal (key, ts) — the row
    *               with the greatest value wins.
    */
  /** @param tolerance max |left.ts − right.ts| to accept (pandas
    *                   merge_asof's `tolerance`), in the ts column's
    *                   integral unit — native units for long columns,
    *                   whole seconds for timestamps: a match staler
    *                   than this yields nulls, same as no match. None =
    *                   any age. Applied AFTER the carry, so it costs
    *                   one scan-level comparison, not a different join.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String], tieCol: String,
               prefix: String = "r_", tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, tsCol, payload, tieCol, prefix, fwd = false, tolerance)

  /** Forward as-of: earliest right row with `right.ts >= left.ts`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, payload: Seq[String], tieCol: String,
              prefix: String = "r_", tolerance: Option[Long] = None): DataFrame =
    join(left, right, keys, tsCol, payload, tieCol, prefix, fwd = true, tolerance)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Seq[String], tieCol: String,
                   prefix: String, fwd: Boolean,
                   tolerance: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val leftRest = left.columns.toSeq.filterNot(keys.contains)

    // regularize right ties: one row per (keys, ts), greatest tieCol
    // wins; the struct carries the matched ts for the tolerance gate
    val rightOne = right
      .groupBy((keys :+ tsCol).map(col): _*)
      .agg(max_by(struct(col(tsCol).as("__rts") +: payload.map(col): _*),
        col(tieCol)).as("__r"))

    val rSide = rightOne.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(0).as("__side") :+ col("__r")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val rType = rightOne.schema("__r").dataType
    val lSide = left.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(rType).as("__r")) ++ leftRest.map(col): _*)

    // at equal ts the right row must sort before the left row it can
    // match (<= / >= semantics), in both directions → side ascending
    val ord =
      if (fwd) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case Some(tol) => carried.withColumn("__m",
        when(abs(col("__ts").cast("long") -
          col("__m").getField("__rts").cast("long")) <= tol, col("__m")))
      case None => carried
    }
    gated
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ leftRest.map(col) ++
        payload.map(p => col("__m").getField(p).as(prefix + p)): _*)
  }
}
