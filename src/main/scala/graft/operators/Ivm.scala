package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates — the
  * never-recompute discipline at 100 TB: a stored `GROUP BY` view of
  * counts and sums is brought current by folding in a DELTA batch
  * (inserts as +1 rows, deletes as −1 retractions), touching only the
  * delta's groups. The reference recomputes its operational rollups
  * by rescanning state (`describeBatch` aggregates per call); this is
  * the engine-side form where the base table is too big to rescan.
  *
  * Correctness anchor: count and sum are ABELIAN-GROUP aggregates
  * (invertible, commutative, associative), so
  * `maintain(view(T), Δ) ≡ view(T ⊎ Δ)` EXACTLY — for any delta
  * order, any batching, including retractions of rows never seen
  * (they debit the group like a ledger; the caller's contract is that
  * deltas are genuine). Groups whose maintained count reaches 0 drop
  * out of the view, exactly as a recompute would drop them. Min/max
  * are NOT group-invertible and deliberately absent — maintain those
  * with [[StoredMerge.upsertBuckets]] + per-bucket recompute instead.
  *
  * Scale shape: the delta pre-aggregates to its own (group → count,
  * sums) contraction (one hash aggregate over the BATCH only), then
  * one full-outer join against the stored view on the group key — the
  * stored side shuffles its group table (group-cardinality, not
  * base-table-cardinality); the base table is never touched. With the
  * view saved bucketed on the group key the join is exchange-free on
  * the stored side ([[StoredMerge.upsertStored]]'s layout discipline).
  */
object Ivm {

  /** Fold a signed delta into a stored count/sum view.
    *
    * @param view    stored aggregate: `keys ++ (n, <sumCols>)`
    * @param delta   raw delta rows: `keys ++ (signCol, <valueCols>)`,
    *                sign +1 for insert, −1 for delete/retraction
    * @param keys    group key columns
    * @param sumCols (viewSumCol → deltaValueCol) pairs to maintain
    */
  def applyDelta(view: DataFrame, delta: DataFrame, keys: Seq[String],
                 signCol: String,
                 sumCols: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("__dn"),
        sumCols.map { case (v, d) =>
          sum(col(d) * col(signCol)).as(s"__d_$v")
        }: _*)
    val joined = view
      .withColumnRenamed("n", "__vn")
      .join(dAgg, keys, "full_outer")
    val maintained = sumCols.foldLeft(
      joined.withColumn("n",
        coalesce(col("__vn"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
    ) { case (df, (v, _)) =>
      df.withColumn(v,
        coalesce(col(v), lit(0L)) + coalesce(col(s"__d_$v"), lit(0L)))
    }
    maintained
      .filter(col("n") =!= 0L) // emptied groups leave the view
      .select((keys.map(col) :+ col("n")) ++ sumCols.map(p => col(p._1)): _*)
  }

  /** Build the view shape [[applyDelta]] maintains, from a base table:
    * `keys ++ (n, <sumCols>)`. */
  def view(base: DataFrame, keys: Seq[String],
           sumCols: Seq[(String, String)]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map { case (v, d) => sum(col(d)).as(v) }: _*)
}
