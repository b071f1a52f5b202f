package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot differencing — classify every key across two table
  * versions as `added` / `removed` / `changed` / `unchanged`: the
  * change-data-capture complement to [[StoredMerge]] (the reference
  * mutates config/ledger rows in place — `index.js` updateConfig /
  * batch state transitions; this is the engine-side set form that
  * AUDITS two states instead of producing one).
  *
  * Scale design (100 TB): one full-outer hash join on the key columns
  * — both sides shuffle exactly once on the key; comparison columns
  * ride the join row, compared null-safely (`<=>`), no window, no
  * collect. The summary is a map-side-partial count rollup.
  */
object SnapshotDiff {

  /** Per-key classification. Output: the key columns + `change_type`
    * (`added` = key only in `next`, `removed` = key only in `prev`,
    * `changed` = present in both with any compare column differing
    * null-safely, `unchanged`). Compare columns must exist on both
    * sides.
    */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val p = prev.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_prev", lit(1))
    val n = next.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_next", lit(1))
    val pc = compareCols.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"__p_$c"))
    val nc = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = pc.join(nc, keys, "full_outer")
    val anyDiff = compareCols
      .map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    joined.select(keys.map(col) :+
      when(col("__in_prev").isNull, lit("added"))
        .when(col("__in_next").isNull, lit("removed"))
        .when(anyDiff, lit("changed"))
        .otherwise(lit("unchanged")).as("change_type"): _*)
  }

  /** Roll-up of [[diff]]: one row per change_type with its key count
    * (all four types present with count 0 absent — downstream joins
    * should left-join a type dimension if they need dense rows).
    */
  def summary(prev: DataFrame, next: DataFrame, keys: Seq[String],
              compareCols: Seq[String]): DataFrame =
    diff(prev, next, keys, compareCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"))
}
