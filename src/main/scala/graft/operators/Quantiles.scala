package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Value-domain bound for the exact path; above it (HLL estimate at
    * rsd = 2%, passed explicitly — the default is 5%) thresholds come
    * from `percentile_approx`. 10^5 matches the documented envelope of
    * binnable columns.
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
    val est = df.agg(approx_count_distinct(col(valueCol), 0.02).as("d")).head.getLong(0)
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

  /** Exact per-group lower median — the value at rank
    * k = clamp(floor((n+1)/2), 1, n) within each group — WITHOUT a
    * per-group full sort. `row_number() OVER (PARTITION BY g ORDER BY
    * v)` is the textbook formulation and a scale trap when the group
    * key is low-cardinality and skewed (a ~10-value `lang` column puts
    * the dominant language — English ≈ 2/3 of web text — through ONE
    * task's sort). Two passes instead:
    *
    *  1. BRACKET: one mergeable GK pass (`percentile_approx` at
    *     0.5 ± 2/accuracy) yields per-group [lo, hi] candidate bounds,
    *     plus n, min, max. A second exact count pass VERIFIES the
    *     bracket (#{v < lo} < k ≤ #{v ≤ hi}); any group where the
    *     sketch guarantee fell short (or n too small for the margin)
    *     falls back to [min, max] — exactness never depends on the
    *     sketch, only the size of pass 2.
    *  2. SELECT: rows inside the bracket — at most O(4·n/accuracy) per
    *     group by the GK rank guarantee (rank error ≤ n/accuracy) —
    *     contract to distinct (group, value) counts, and a window
    *     cumsum over THOSE finds the first value whose cumulative
    *     count reaches k. The only per-group sort in the plan runs
    *     over bracket rows (plan-guarded in PlanAuditSpec), a
    *     accuracy/4-fold reduction vs the naive window.
    *
    * The rank-k value of (v, tiebreak) equals the k-th order statistic
    * of v alone — tie-break columns change which ROW is at rank k,
    * never the VALUE — so callers ranking by (v, id) get the identical
    * cut. Null VALUES are excluded (SQL aggregate semantics); null
    * GROUP KEYS are excluded too (the bound joins are null-unsafe) —
    * unlike GROUP BY, a null group gets no median row. Per-group
    * stats/bounds are group-cardinality-sized and broadcast; the data
    * passes are one groupBy each.
    */
  def exactMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         accuracy: Int = 10000): DataFrame =
    exactQuantileByGroup(df, groupCol, valueCol, 0.5, accuracy)

  /** Exact per-group p-quantile — the value at rank
    * k = clamp(⌈p·n⌉, 1, n), the discrete-quantile convention DuckDB's
    * `quantile_disc` shares (at p = 0.5 this IS the lower median:
    * ⌈n/2⌉ = ⌊(n+1)/2⌋). Same two-pass GK-bracketed selection as the
    * median — see the scaladoc above; the bracket simply sits at
    * p ± 2/accuracy instead of 0.5 ± 2/accuracy. Tail quantiles
    * (P95/P99 latency-style profiling) stay exact AND scale-safe: no
    * per-group sort anywhere, pass-2 input is O(n/accuracy) rows per
    * group.
    */
  def exactQuantileByGroup(df: DataFrame, groupCol: String, valueCol: String,
                           p: Double, accuracy: Int = 10000): DataFrame =
    exactQuantileByGroupImpl(df, groupCol, valueCol, p, accuracy,
      delta = 2.0 / accuracy)

  private[graft] def exactMedianByGroupImpl(
      df: DataFrame, groupCol: String, valueCol: String,
      accuracy: Int, delta: Double): DataFrame =
    exactQuantileByGroupImpl(df, groupCol, valueCol, 0.5, accuracy, delta)

  /** Impl with the bracket half-width exposed so tests can force the
    * degenerate-bracket fallback (e.g. delta < 0 makes lo0 > hi0 — an
    * empty candidate set that MUST route through [min, max]).
    */
  private[graft] def exactQuantileByGroupImpl(
      df: DataFrame, groupCol: String, valueCol: String,
      p: Double, accuracy: Int, delta: Double): DataFrame = {
    require(p > 0.0 && p < 1.0, s"quantile p must be in (0,1), got $p")
    exactRankByGroupImpl(df, groupCol, valueCol,
      n => greatest(lit(1L), least(n, ceil(lit(p) * n).cast("long"))),
      p - delta, p + delta, accuracy)
  }

  /** Exact per-group p-quantiles for SEVERAL probabilities through ONE
    * GK-bracketed two-pass selection — the latency-profile shape
    * (P50/P90/P99 in one call). Chaining [[exactQuantileByGroup]] per
    * p costs the full three-pass cascade (sketch → count-verify →
    * bracket select, two dependent broadcast barriers each) PER
    * QUANTILE; the probes are independent per p, so they batch
    * (guide §1.2: fewer passes, fewer dependent driver barriers):
    *
    *  - pass 1 evaluates ONE GK sketch at all 2·|ps| probes and emits
    *    every p's target rank k_p = clamp(⌈p·n⌉, 1, n);
    *  - pass 2 count-verifies ALL brackets in one aggregate (per p:
    *    #{v < lo_p}, #{v ≤ hi_p}; fallback to [min, max] per p exactly
    *    as the single-p path);
    *  - pass 3 filters to the UNION of brackets and runs the
    *    distinct-value cumsum once, with one MASKED running count per
    *    p over the SAME window sort — a row outside bracket p
    *    contributes 0 to cum_p, so each p's crossing lands on exactly
    *    the row the single-p selection picks (the crossing condition
    *    `cum ≥ k−c_below ∧ cum − c < k−c_below` cannot fire on a
    *    zero-contribution row).
    *
    * Per-p results are therefore VALUE-IDENTICAL to
    * [[exactQuantileByGroup]] (spec-asserted); only the pass count
    * changes. Returns one row per group: (group, <name> per p).
    */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                            ps: Seq[(Double, String)],
                            accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    ps.foreach { case (p, _) =>
      require(p > 0.0 && p < 1.0, s"quantile p must be in (0,1), got $p") }
    val delta = 2.0 / accuracy
    def clamp(x: Double) = math.min(1.0, math.max(0.0, x))
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.select(g, v).where(v.isNotNull)
    val idx = ps.indices
    val probes = array(ps.flatMap { case (p, _) =>
      Seq(lit(clamp(p - delta)), lit(clamp(p + delta))) }: _*)
    val stats0 = base.groupBy(g).agg(
        count(lit(1)).as("n"),
        percentile_approx(v, probes, lit(accuracy)).as("__q"),
        min(v).as("vmin"), max(v).as("vmax"))
    val stats = idx.foldLeft(stats0) { (acc, i) =>
      val p = ps(i)._1
      acc.withColumn(s"k_$i", greatest(lit(1L),
          least(col("n"), ceil(lit(p) * col("n")).cast("long"))))
        .withColumn(s"lo0_$i", col("__q").getItem(2 * i))
        .withColumn(s"hi0_$i", col("__q").getItem(2 * i + 1))
    }.drop("__q", "n")
    // one exact verification pass for every bracket (stats is group-
    // cardinality-sized — broadcast; its columns ride the aggregation
    // as grouping keys, functionally dependent on the group key)
    val statCols = Seq("vmin", "vmax") ++
      idx.flatMap(i => Seq(s"k_$i", s"lo0_$i", s"hi0_$i"))
    val cntAggs = idx.flatMap(i => Seq(
      sum(when(v < col(s"lo0_$i"), 1L).otherwise(0L)).as(s"c_lo_$i"),
      sum(when(v <= col(s"hi0_$i"), 1L).otherwise(0L)).as(s"c_hi_$i")))
    val counts = base
      .join(broadcast(stats), groupCol)
      .groupBy(g +: statCols.map(col): _*)
      .agg(cntAggs.head, cntAggs.tail: _*)
    val br = counts.select(g +: idx.flatMap { i =>
      val ok = col(s"c_lo_$i") < col(s"k_$i") && col(s"k_$i") <= col(s"c_hi_$i")
      Seq(
        when(ok, col(s"lo0_$i")).otherwise(col("vmin")).as(s"blo_$i"),
        when(ok, col(s"hi0_$i")).otherwise(col("vmax")).as(s"bhi_$i"),
        when(ok, col(s"c_lo_$i")).otherwise(lit(0L)).as(s"cb_$i"),
        col(s"k_$i"))
    }: _*)
    val brCols = idx.flatMap(i => Seq(s"blo_$i", s"bhi_$i", s"cb_$i", s"k_$i"))
    val inAny = idx.map(i => v >= col(s"blo_$i") && v <= col(s"bhi_$i"))
      .reduce(_ || _)
    val perVal = base.join(broadcast(br), groupCol)
      .filter(inAny)
      .groupBy(g +: brCols.map(col) :+ v.as("bv"): _*)
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(g).orderBy(col("bv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = idx.foldLeft(perVal) { (acc, i) =>
      acc.withColumn(s"cin_$i",
          when(col("bv") >= col(s"blo_$i") && col("bv") <= col(s"bhi_$i"),
            col("c")).otherwise(lit(0L)))
        .withColumn(s"cum_$i", sum(col(s"cin_$i")).over(w))
    }
    def cutOf(i: Int): Column = min(when(
      col(s"cb_$i") + col(s"cum_$i") >= col(s"k_$i") &&
        col(s"cb_$i") + col(s"cum_$i") - col(s"cin_$i") < col(s"k_$i"),
      col("bv"))).as(ps(i)._2)
    withCums.groupBy(g).agg(cutOf(0), idx.tail.map(cutOf): _*)
  }

  /** The GK-bracketed two-pass selection generalized to an ARBITRARY
    * per-group target rank k(n) (1-based): the sketch bracket sits at
    * the [pLo, pHi] approximate quantiles and is VERIFIED by an exact
    * count pass (fallback to [min, max] when the target rank escapes
    * it), then the distinct-value cumsum selects the k-th order
    * statistic exactly. Callers must pick [pLo, pHi] so the bracket
    * usually contains rank k — correctness never depends on it, only
    * the pass-2 input size does.
    */
  private[graft] def exactRankByGroupImpl(
      df: DataFrame, groupCol: String, valueCol: String,
      kOf: Column => Column, pLo: Double, pHi: Double,
      accuracy: Int): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.select(g, v).where(v.isNotNull)
    val loP = math.min(1.0, math.max(0.0, pLo))
    val hiP = math.min(1.0, math.max(0.0, pHi))
    // SINGLE-CONSUMER stats: the sketch frame is broadcast into the
    // count pass and its columns RIDE THROUGH that aggregation as
    // grouping keys (they are functionally dependent on the group key
    // — the trimmedMeanByGroup carry-through), so the GK pass runs
    // exactly once with NO cache entry. The previous shape joined
    // stats twice and papered over the recompute with a lazy persist
    // that nothing ever released — the r10-flagged leak.
    val stats = base.groupBy(g).agg(
        count(lit(1)).as("n"),
        percentile_approx(v, lit(loP), lit(accuracy)).as("lo0"),
        percentile_approx(v, lit(hiP), lit(accuracy)).as("hi0"),
        min(v).as("vmin"), max(v).as("vmax"))
      .withColumn("k", greatest(lit(1L), least(col("n"), kOf(col("n")))))
    // exact bracket verification: one count pass against the sketch
    // bounds (stats is group-cardinality-sized — broadcast); the
    // carried stats columns make this frame self-sufficient for the
    // bound selection below
    val counts = base
      .join(broadcast(stats), groupCol)
      .groupBy(g, col("n"), col("lo0"), col("hi0"), col("vmin"),
        col("vmax"), col("k"))
      .agg(
        sum(when(v < col("lo0"), 1L).otherwise(0L)).as("c_lo"),
        sum(when(v <= col("hi0"), 1L).otherwise(0L)).as("c_hi"))
    val br = counts
      .withColumn("ok", col("c_lo") < col("k") && col("k") <= col("c_hi"))
      .select(g,
        when(col("ok"), col("lo0")).otherwise(col("vmin")).as("blo"),
        when(col("ok"), col("hi0")).otherwise(col("vmax")).as("bhi"),
        when(col("ok"), col("c_lo")).otherwise(lit(0L)).as("c_below"),
        col("k"))
    // exact selection inside the bracket: distinct-value cumsum — the
    // window's per-task input is bracket rows only (see scaladoc bound)
    val bracket = base.join(broadcast(br), groupCol)
      .filter(v >= col("blo") && v <= col("bhi"))
    val perVal = bracket
      .groupBy(g, v.as("bv"), col("c_below"), col("k"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(g).orderBy(col("bv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perVal.withColumn("cum", sum(col("c")).over(w))
      .filter(col("c_below") + col("cum") >= col("k") &&
        col("c_below") + col("cum") - col("c") < col("k"))
      .select(g, col("bv").as("cut"))
  }

  /** Exact per-group trimmed mean — drop the lowest and highest
    * k = ⌊n·trim⌋ rows (trim = trimNum/trimDen per tail) and average
    * the rest: the robust location estimate between the mean (trim 0)
    * and the [[exactMedianByGroup]] (trim → 1/2), standard for
    * latency/quality metrics where a handful of wild rows swamp the
    * mean but the median wastes too much data.
    *
    * EXACT at any skew with NO per-group sort, in TWO data passes
    * total: pass 1 is one hash aggregate (n, Σv, and a single GK
    * sketch evaluated at both trim brackets' probes); pass 2 collapses
    * every out-of-bracket row onto an order-preserving SENTINEL value
    * (below → blo1−1, between the brackets → bhi1+1, above → dropped
    * and reconstituted from Σv), so one distinct-value cumsum carries
    * exact global ranks AND exact prefix value sums — the separate
    * count-verification pass and the final stats pass of a naive
    * bracketed pipeline fold into it. The window's input stays
    * O(n/accuracy) rows per group. Both cut values (the (k+1)-th and
    * (n−k)-th order statistics) read off the two crossing rows, and
    * the tie-exact algebra finishes arithmetically:
    *   trimmed_sum = Σv − [Σ_{v<lo} v + lo·(k − #{v<lo})]
    *               − [Σ_{v>hi} v + hi·(k − #{v>hi})]
    * (rows equal to a cut are interchangeable — equal values
    * contribute equal sums, so tie order cannot matter). Sums ride
    * DECIMAL(38,0); `valueCol` must be integral (fixed-point longs,
    * Long.MinValue/MaxValue excluded — the sentinel arithmetic needs
    * one spare value on each side, only ever materialized when the
    * adjacent out-of-bracket region is nonempty). The exclusion is
    * ENFORCED: a row at either extreme raises at scan time rather
    * than risking a silent sentinel collision.
    *
    * Exactness does NOT ride on the sketch: GK's deterministic rank
    * bound guarantees each target rank lands inside its bracket, and
    * if that were ever violated the crossing would land on a sentinel
    * row and the operator RAISES — loud failure, never a wrong cut.
    *
    * Returns per group: n, k_trim, cut lo/hi, n_kept, trimmed_sum
    * (BIGINT), and the truncating micro-quotient trimmed_mean_micro =
    * trimmed_sum·10⁶ div n_kept. Requires trim < 1/2 (n_kept ≥ 1
    * for every n ≥ 1 follows).
    */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         trimNum: Int, trimDen: Int,
                         accuracy: Int = 10000): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && 2L * trimNum < trimDen,
      s"need 0 <= trim < 1/2, got $trimNum/$trimDen")
    val g = col(groupCol)
    val p = trimNum.toDouble / trimDen
    val delta = 2.0 / accuracy
    def clamp(x: Double) = math.min(1.0, math.max(0.0, x))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val base = df.select(g, col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val v = col("__v")
    // pass 1: per group n, Σv, and ONE GK sketch evaluated at both
    // brackets' four probes. GK's deterministic rank bound (error ≤
    // n/accuracy at probes p ± 2/accuracy) guarantees each target rank
    // lands inside its bracket; the crossing guard below still turns a
    // violated bound into a loud error, never a silent wrong cut.
    val probes = array(lit(clamp(p - delta)), lit(clamp(p + delta)),
      lit(clamp(1.0 - p - delta)), lit(clamp(1.0 - p + delta)))
    val stats = base.groupBy(g).agg(
        count(lit(1)).as("n"),
        sum(dec(v)).as("__s"),
        percentile_approx(v, probes, lit(accuracy)).as("q4"),
        min(v).as("__vlo"), max(v).as("__vhi"))
      // LOUD boundary guard at the call contract: the sentinel
      // arithmetic needs one spare value on each side of the domain,
      // so Long.MinValue/MaxValue are excluded (scaladoc) — enforced
      // here by gating n itself (the bhAdjust __nbad convention), on
      // GROUP rows (free) rather than a per-row scan branch (which
      // would tax the corpus pass). A silent sentinel collision at the
      // extremes would corrupt the rank arithmetic with no symptom.
      .withColumn("n", when(
        col("__vlo") === lit(Long.MinValue) || col("__vhi") === lit(Long.MaxValue),
        raise_error(lit("trimmedMeanByGroup: valueCol at Long.MinValue/" +
          "MaxValue — the sentinel arithmetic needs one spare value each " +
          "side; rescale the fixed-point encoding")).cast("long"))
        .otherwise(col("n")))
      .withColumn("k_trim", expr(s"(n * ${trimNum}L) div ${trimDen}L"))
      .withColumn("k1", col("k_trim") + lit(1L))
      .withColumn("k2", col("n") - col("k_trim"))
      .select(g, col("n"), col("__s"), col("k_trim"), col("k1"), col("k2"),
        col("q4").getItem(0).as("blo1"), col("q4").getItem(1).as("bhi1"),
        col("q4").getItem(2).as("blo2"), col("q4").getItem(3).as("bhi2"))
      // single consumer (the broadcast into pass 2) — no caching
      // needed; an eager checkpoint here would only add a job barrier
    // pass 2: collapse out-of-bracket rows onto ORDER-PRESERVING
    // sentinel values (below bracket1 → blo1−1; between the brackets →
    // bhi1+1, which sits strictly between them whenever that region is
    // nonempty; above bracket2 → dropped, reconstituted from Σv), so
    // ONE distinct-value cumsum carries exact global ranks AND exact
    // prefix value sums at every bracket value — the count pass, the
    // bracket pass, and the final stats pass of the naive pipeline all
    // fold into this single scan. Sentinel rows aggregate the real v
    // sums (never the sentinel value), so prefix sums stay exact.
    val classified = base.join(broadcast(stats), groupCol)
      .withColumn("__in", (v >= col("blo1") && v <= col("bhi1")) ||
        (v >= col("blo2") && v <= col("bhi2")))
      .filter(col("__in") || v <= col("bhi2"))
      .withColumn("__bv",
        when(col("__in"), v)
          .when(v < col("blo1"), col("blo1") - lit(1L))
          .otherwise(col("bhi1") + lit(1L)))
    val perVal = classified
      .groupBy(g, col("n"), col("__s"), col("k_trim"), col("k1"), col("k2"),
        col("__bv"))
      .agg(count(lit(1)).as("c"), sum(dec(v)).as("sv"),
        max(col("__in")).as("real"))
    // the window's per-task input is bracket rows + ≤ 2 sentinel rows
    // per group (the scaladoc bound) — both running sums share one sort
    val w = Window.partitionBy(g).orderBy(col("__bv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perVal
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("cumv", sum(col("sv")).over(w))
    def crossing(k: Column): Column =
      col("cum") >= k && col("cum") - col("c") < k
    val cross1 = crossing(col("k1"))
    val cross2 = crossing(col("k2"))
    def guarded(okCol: String, cutCol: String): Column =
      when(col(okCol), col(cutCol)).otherwise(raise_error(
        lit("trimmedMeanByGroup: target rank escaped the GK bracket — " +
          "raise accuracy")).cast("long"))
    cum.groupBy(g, col("n"), col("__s"), col("k_trim"))
      .agg(
        min(when(cross1, col("__bv"))).as("__lo"),
        max(when(cross1, col("real"))).as("__r1"),
        min(when(cross1, col("cum") - col("c"))).as("__n_lt"),
        min(when(cross1, col("cumv") - col("sv"))).as("__s_lt"),
        min(when(cross2, col("__bv"))).as("__hi"),
        max(when(cross2, col("real"))).as("__r2"),
        min(when(cross2, col("cum"))).as("__n_le"),
        min(when(cross2, col("cumv"))).as("__s_le"))
      // a crossing on a sentinel row (or no crossing at all — __r null)
      // would mean the GK bound failed: fail loudly, never emit a
      // sentinel value as a cut
      .withColumn("cut_lo", guarded("__r1", "__lo"))
      .withColumn("cut_hi", guarded("__r2", "__hi"))
      .withColumn("n_kept", col("n") - lit(2L) * col("k_trim"))
      .withColumn("trimmed_sum",
        (col("__s")
          - (col("__s_lt") + dec(col("cut_lo")) * (col("k_trim") - col("__n_lt")))
          - ((col("__s") - col("__s_le"))
            + dec(col("cut_hi")) * (col("k_trim") - (col("n") - col("__n_le")))))
          .cast("long"))
      .withColumn("trimmed_mean_micro",
        expr("CAST((CAST(trimmed_sum AS DECIMAL(38,0)) * 1000000) div n_kept AS BIGINT)"))
      .select(g, col("n"), col("k_trim"), col("cut_lo"), col("cut_hi"),
        col("n_kept"), col("trimmed_sum"), col("trimmed_mean_micro"))
  }

  /** Per-group equi-WIDTH histogram (the profiling complement of the
    * equi-depth [[valueThresholds]] buckets): bin i of B covers
    * [min + i·w, min + (i+1)·w) with w = (max − min)/B, the last bin
    * closed. Two passes, both plain hash aggregates: a per-group
    * (min, max, n) pass (group-cardinality-sized, broadcast back) and
    * the binned count pass — `floor((v − min)/w)` is scan-side IEEE
    * arithmetic any engine reproduces bit-for-bit, so bin edges AND
    * counts hash-certify. Degenerate all-equal groups (w = 0) land in
    * bin 0. Empty bins are absent (count table, not a dense grid —
    * join [[graft.operators.TimeSeries.gapFill]] for dense output).
    */
  def histogramByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.select(g, v).where(v.isNotNull && g.isNotNull)
    val stats = base.groupBy(g).agg(min(v).as("vmin"), max(v).as("vmax"))
      .withColumn("w", (col("vmax") - col("vmin")) / lit(bins.toDouble))
    base.join(broadcast(stats), groupCol)
      .withColumn("bin",
        when(col("w") === 0.0, lit(0L)).otherwise(
          least(lit(bins - 1L), floor((v - col("vmin")) / col("w")).cast("long"))))
      .groupBy(g, col("bin"), col("vmin"), col("w"))
      .agg(count(lit(1)).as("n"))
      .select(g, col("bin"),
        (col("vmin") + col("bin") * col("w")).as("bin_lo"),
        (col("vmin") + (col("bin") + 1) * col("w")).as("bin_hi"),
        col("n"))
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

  /** Multi-metric [[bucketAssign]]: one threshold set PER COLUMN, all
    * computed from the SAME base frame and attached in one pass.
    * Chaining single-column bucketAssign calls instead would nest each
    * metric's crossJoin+window inside the next metric's threshold
    * subtree — the plan re-executes metric 1's assignment once per
    * later metric (measured: 14 cartesians for a 3-metric RFM where
    * this shape has 3). Adds `<col>_q` ∈ [1, buckets] per metric.
    */
  def bucketAssignMulti(df: DataFrame, valueCols: Seq[String], buckets: Int,
                        maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    require(valueCols.nonEmpty, "need at least one metric column")
    val withThs = valueCols.foldLeft(df) { (acc, c) =>
      val th = valueThresholds(df, c, buckets, maxDistinct)
        .agg(collect_list(struct(col("k"), col("threshold"))).as(s"__ths_$c"))
        .select(col(s"__ths_$c"))
      acc.crossJoin(broadcast(th))
    }
    valueCols.foldLeft(withThs) { (acc, c) =>
      acc.withColumn(s"${c}_q",
        (lit(1) + aggregate(col(s"__ths_$c"), lit(0),
          (n, t) => n + when(col(c) > t.getField("threshold"), 1)
            .otherwise(0))).cast("int"))
    }.drop(valueCols.map(c => s"__ths_$c"): _*)
  }

  /** Per-group exact percentile rank (mid-rank convention) in
    * micro-units: each row gets
    * `pct_micro = (2·countBelow + countEqual) · 10⁶ div (2·n)` within
    * its group — the CDF-normalize that makes scores COMPARABLE
    * ACROSS GROUPS before a global cut (per-source classifier
    * calibration: a 0.7 from a lenient source and a 0.7 from a strict
    * one are different animals; their percentiles are not). Integer
    * arithmetic end to end; ties share one rank by construction.
    *
    * Plan shape: counts contract to (group, DISTINCT value), the
    * cumulative window rides that contraction partitioned by group,
    * and rows join back on (group, value) — corpus rows never enter a
    * sort ([[valueThresholds]]' contract: discrete/integer-cleared
    * values).
    */
  def percentileRankByGroup(df: DataFrame, groupCol: String,
                            valueCol: String): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val perVal = df.where(v.isNotNull)
      .groupBy(g, v.as("__v")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(g).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(g, col("__v"), expr(
        "(2L * __below + __c) * 1000000L div (2L * __n)").as("pct_micro"))
    df.join(ranked.withColumnRenamed("__v", valueCol), Seq(groupCol, valueCol))
  }

  /** Exact WEIGHTED quantile per group: the smallest value whose
    * cumulative integer weight reaches ⌈p·W⌉ (W = group weight total)
    * — weighted medians for "half the TOKEN mass sits below this
    * document length" questions, where the unweighted cut answers the
    * wrong population. Rank arithmetic is integer throughout: the
    * threshold ⌈p·W⌉ = (num·W + den − 1) div den with p = num/den, so
    * the whole cut hash-certifies.
    *
    * Plan shape: one hash aggregate contracts to (group, DISTINCT
    * value, weight sum) and the cumulative window rides THAT
    * contraction partitioned by group — the [[valueThresholds]]
    * value-distinct contract (discrete/binned values; integer-clear a
    * continuous measure first). Null values and null/≤0 weights drop.
    */
  def weightedCutByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         weightCol: String, pNum: Long, pDen: Long): DataFrame = {
    require(pNum > 0 && pNum < pDen, s"need 0 < p < 1, got $pNum/$pDen")
    val g = col(groupCol)
    val v = col(valueCol)
    val wt = col(weightCol).cast("long")
    val perVal = df.where(v.isNotNull && wt.isNotNull && wt > 0)
      .groupBy(g, v.as("bv")).agg(sum(wt).as("wv"))
    val totals = perVal.groupBy(g).agg(sum(col("wv")).as("tw"))
    val w = Window.partitionBy(g).orderBy(col("bv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perVal
      .join(broadcast(totals), groupCol)
      .withColumn("k", expr(s"(${pNum}L * tw + ${pDen}L - 1L) div ${pDen}L"))
      .withColumn("cum", sum(col("wv")).over(w))
      .filter(col("cum") >= col("k") && col("cum") - col("wv") < col("k"))
      .select(g, col("bv").as("cut"), col("tw").as("total_weight"),
        col("k").as("target_rank"))
  }
}
