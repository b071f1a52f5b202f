package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Skyline / Pareto-frontier operator (Börzsönyi, Kossmann, Stocker,
  * ICDE 2001): the rows not DOMINATED by any other row, where row b
  * dominates row a iff b is ≤ a on every (minimized) dimension and
  * strictly < on at least one. The multi-criteria "best offers" /
  * "best checkpoints" query a single ORDER BY cannot express.
  * Reference analogue: none (driver-brief analytics family).
  *
  * Scale design (100 TB): the classic two-phase distributed shape —
  * (1) a LOCAL skyline per partition via `mapPartitions` (the
  * documented last-resort tier: dominance is genuinely per-partition
  * imperative work — no key to shuffle on, no join to express it
  * without an all-pairs θ-join, which is exactly the cartesian the
  * plan police forbids); local skylines are correct to union because
  * any global-skyline row is undominated in ITS partition; (2) the
  * global skyline of the unioned candidates on ONE partition. Phase-2
  * input is Σ local-skyline sizes — for d small and real (correlated)
  * data this is tiny; the `maxCandidates` guard fails loud instead of
  * silently collecting an adversarial anti-correlated blow-up onto
  * one task. Both phases use the same O(n·|skyline|) filter loop with
  * a sort on the first dimension so later rows can never dominate
  * kept ones on ties — making the result EXACT, not heuristic.
  */
object Skyline extends Serializable {

  /** Rows of `df` on the Pareto frontier, all `dims` MINIMIZED
    * (negate a column upstream to maximize it). Dimension columns
    * must be numeric and non-null. Output = the input rows
    * (deduplicated dominance-equal rows are all kept: equality on
    * every dim is not domination).
    */
  def skyline(df: DataFrame, dims: Seq[String],
              maxCandidates: Long = 1000000L): DataFrame = {
    require(dims.nonEmpty, "at least one dimension")
    val spark = df.sparkSession
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex)

    def dominates(b: Row, a: Row): Boolean = {
      var strict = false
      var i = 0
      while (i < idx.length) {
        val vb = toD(b, idx(i)); val va = toD(a, idx(i))
        if (vb > va) return false
        if (vb < va) strict = true
        i += 1
      }
      strict
    }

    // lexicographic over ALL dims: a later row can then never dominate
    // an earlier one (domination means ≤ everywhere, so the first
    // differing dim would have sorted it earlier; all-equal is not
    // domination) — one forward pass against the kept list is exact.
    // Sorting on the first dim alone is NOT enough: ties there let a
    // later row dominate a kept one.
    def lexLess(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < idx.length) {
        val va = toD(a, idx(i)); val vb = toD(b, idx(i))
        if (va < vb) return true
        if (va > vb) return false
        i += 1
      }
      false
    }

    def localSkyline(rows: Iterator[Row]): Iterator[Row] = {
      val sorted = rows.toArray.sortWith(lexLess)
      val kept = scala.collection.mutable.ArrayBuffer.empty[Row]
      var i = 0
      while (i < sorted.length) {
        val cand = sorted(i)
        if (!kept.exists(k => dominates(k, cand))) kept += cand
        i += 1
      }
      kept.iterator
    }

    val local = df.rdd.mapPartitions(localSkyline)
    val candidates = spark.createDataFrame(local, schema)
    val n = candidates.persist().count()
    require(n <= maxCandidates,
      s"phase-2 skyline input $n exceeds maxCandidates=$maxCandidates " +
        "(anti-correlated dimensions?) — raise the guard deliberately")
    val out = spark.createDataFrame(
      candidates.coalesce(1).rdd.mapPartitions(localSkyline), schema)
      // eager localCheckpoint: skyline-sized output, cache manager
      // stays empty (the Dedup.releaseAfter discipline)
      .localCheckpoint()
    candidates.unpersist(blocking = false)
    out
  }

  /** Incremental accretion: the skyline of (old corpus ∪ batch) given
    * only the OLD SKYLINE — correct because a point of
    * skyline(A ∪ B) that lies in A is a fortiori undominated in A, so
    * candidates = old skyline ∪ batch lose nothing. O(batch + old
    * skyline), never rescans the old corpus (the [[DedupIndex]]
    * accretion contract); spec-pinned append ≡ from-scratch.
    */
  def append(oldSkyline: DataFrame, batch: DataFrame, dims: Seq[String],
             maxCandidates: Long = 1000000L): DataFrame =
    skyline(oldSkyline.unionByName(batch), dims, maxCandidates)

  private def toD(r: Row, i: Int): Double = r.get(i) match {
    case null => throw new IllegalArgumentException(
      s"skyline dimension at index $i is null — filter or impute upstream")
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"skyline dimension must be numeric, got ${other.getClass}")
  }
}
