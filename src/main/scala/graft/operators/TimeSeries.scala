package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series repair and rolling aggregation — gap filling
  * (dense grid + forward fill + exact linear interpolation) and
  * bounded rolling sums, the resample/smooth steps of event-series
  * analytics over the tables a loader lands.
  *
  * Scale design (100 TB): every window below partitions by the
  * HIGH-CARDINALITY series key (user, sensor, entity), never by a
  * categorical column — per-task input is one key's series, whose
  * length is bounded by the time RANGE (buckets between the key's
  * first and last observation), not by corpus size. Grid expansion is
  * a per-key `sequence` (no cross join with a calendar table, no
  * global sort); the observed values join back on (key, bucket) — a
  * co-partitioned hash join.
  *
  * Exactness: interpolation is emitted as an INTEGER numerator /
  * denominator pair (value·Δ products of longs), so results are
  * hash-certifiable — no float division inside the operator; callers
  * divide at the edge if they want doubles.
  */
object TimeSeries {

  /** Densify an integer-bucketed series per key: one output row for
    * every bucket in [min(bucket), max(bucket)] of each key, carrying
    *
    *  - `value`       — the observed value (null on gap rows)
    *  - `ffill_value` — last observed value at or before the bucket
    *  - `interp_num` / `interp_den` — exact linear interpolation as a
    *    rational: for a gap at position p between observations
    *    (p0, v0) and (p1, v1), num = v0·(p1−p) + v1·(p−p0) and
    *    den = p1−p0 (so num/den is the interpolated value). Observed
    *    rows carry (value, 1). Leading/trailing gaps (no neighbor on
    *    one side): null — gap fill does not extrapolate.
    *
    * Input must have at most one row per (key, bucket) — pre-aggregate
    * first (the q93 pattern). `bucketCol` and `valueCol` must be
    * integral (LongType after cast); bucket step is 1.
    */
  def gapFill(df: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String): DataFrame = {
    val key = col(keyCol)
    val obs = df.select(key, col(bucketCol).cast("long").as(bucketCol),
      col(valueCol).cast("long").as(valueCol))
    val spans = obs.groupBy(key)
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
    // per-key dense grid: sequence length = the key's own time range
    val grid = spans.select(key,
      explode(sequence(col("__b0"), col("__b1"))).as(bucketCol))
    val joined = grid.join(obs, Seq(keyCol, bucketCol), "left")
    val wAsc = Window.partitionBy(key).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(key).orderBy(col(bucketCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val withNbrs = joined
      .withColumn("__pv", last(v, ignoreNulls = true).over(wAsc))
      .withColumn("__pp", last(when(v.isNotNull, col(bucketCol)), ignoreNulls = true).over(wAsc))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wDesc))
      .withColumn("__np", first(when(v.isNotNull, col(bucketCol)), ignoreNulls = true).over(wDesc))
    withNbrs
      .withColumn("ffill_value", col("__pv"))
      .withColumn("interp_num",
        when(v.isNotNull, v)
          .otherwise(col("__pv") * (col("__np") - col(bucketCol)) +
            col("__nv") * (col(bucketCol) - col("__pp"))))
      .withColumn("interp_den",
        when(v.isNotNull, lit(1L))
          .otherwise(col("__np") - col("__pp")))
      .drop("__pv", "__pp", "__nv", "__np")
  }

  /** Rolling sum and count over the trailing `span` buckets (RANGE
    * frame [bucket−span+1, bucket], so gaps in the series shrink the
    * window's population, as a time-based rolling metric should).
    * `valueCol` may be any numeric; pre-cast to DECIMAL upstream when
    * exact (associativity-independent) sums are required — the q96
    * pattern.
    */
  /** Sweep-line interval concurrency: for each key, the maximum number
    * of simultaneously-open inclusive integer intervals. The classic
    * sweep — +1 at `start`, −1 at `end + 1` — with the per-(key, t)
    * NET delta aggregated FIRST, so the running cumsum orders over
    * distinct times only (no tie ambiguity: an interval closing at t
    * and another opening at t net out before the max is read, which is
    * exactly the inclusive-interval semantic). The only window
    * partitions by the high-cardinality key over its distinct event
    * times — bounded per-task input at any corpus size.
    */
  def maxConcurrency(intervals: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val k = col(keyCol)
    val deltas = intervals
      .select(k, col(startCol).cast("long").as("t"), lit(1L).as("d"))
      .union(intervals.select(k, (col(endCol).cast("long") + 1).as("t"),
        lit(-1L).as("d")))
      .groupBy(k, col("t")).agg(sum(col("d")).as("net"))
    val w = Window.partitionBy(k).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open", sum(col("net")).over(w))
      .groupBy(k).agg(max(col("open")).as("max_concurrent"))
  }

  def rollingSum(df: DataFrame, keyCol: String, bucketCol: String,
                 valueCols: Seq[String], span: Long): DataFrame = {
    require(span >= 1, "span must be >= 1")
    require(valueCols.nonEmpty, "need at least one value column")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rangeBetween(-(span - 1), 0)
    // one WindowExec evaluates every frame function — adding columns
    // over the same (partition, order, frame) spec costs no extra
    // shuffle or sort
    val withSums = valueCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"rolling_$c", sum(col(c)).over(w))
    }
    withSums.withColumn("rolling_n", count(lit(1)).over(w))
  }

  /** One-sided CUSUM change detection (Page 1954) over an integer
    * series, in CLOSED FORM: the textbook recursion
    * `S_t = max(0, S_{t−1} + (x_t − target − slack))` equals
    * `cs_t − min(0, min_{j≤t} cs_j)` for the running sum `cs` of the
    * deviations — so the sequential filter becomes two stacked window
    * functions (cumsum + running min) over the SAME (key, order)
    * spec: one sort, no iteration, no UDF-carried state. All integer
    * arithmetic; `alarm` fires where S crosses `threshold`. The
    * upward detector; run it on negated deviations for the downward
    * side. The monitoring-family completion next to [[Drift]] (batch
    * distribution distance) and [[Outliers]] (pointwise robust
    * flags): CUSUM accumulates small sustained shifts either misses.
    *
    * Intended inputs are CONTRACTED series (per-key daily rollups —
    * O(keys × buckets) rows), where a low-cardinality key partition
    * is a bounded window, not the q74 trap.
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
            targetCol: String, slack: Long, threshold: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__d",
        col(valueCol).cast("long") - col(targetCol).cast("long") - lit(slack))
      .withColumn("__cs", sum(col("__d")).over(w))
      .withColumn("cusum",
        col("__cs") - least(lit(0L), min(col("__cs")).over(w)))
      .withColumn("alarm", col("cusum") > threshold)
      .drop("__d", "__cs")
  }

  /** Exact autocorrelation at lags 1..`maxLag`, per series key, with
    * the mean CLEARED instead of divided: multiplying the classic
    *   r_l = Σ_{t≤n−l}(x_t−x̄)(x_{t+l}−x̄) / Σ(x_t−x̄)²
    * through by n² (x̄ = S/n) gives
    *   num_l = Σ (n·x_t − S)(n·x_{t+l} − S),  den = Σ (n·x_t − S)²
    * — exact BIGINTs whose single IEEE division num/den reproduces r_l
    * bit-for-bit on any engine. Lag means ROW lag under the
    * (`orderCol`) total order: pre-fill gaps ([[gapFill]]) when the
    * index must be calendar-dense.
    *
    * One window pass per key carries all `maxLag` leads (the window
    * rides the per-key series, bounded by series length — days, not
    * events); the rest is two hash aggregates. Overflow contract:
    * n²·max|x|²·n must stay under 2^63 — pre-scale hot series to
    * coarser units (the centi-unit convention) when it can't.
    */
  def acf(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val base = df.select(col(keyCol).as("key"), col(orderCol).as("t"),
      col(valueCol).cast("long").as("x"))
    val w = Window.partitionBy(col("key")).orderBy(col("t"))
    val stats = base.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    // leads materialize in a plain projection FIRST (one WindowExec for
    // all lags); the generator then explodes ordinary columns — Spark
    // rejects window expressions inside a generator
    val withLeads = base.select(
      col("key") +: col("x") +:
        (1 to maxLag).map(l => lead(col("x"), l).over(w).as(s"__xl$l")): _*)
    val exploded = withLeads
      .withColumn("__l", explode(array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"), col(s"__xl$l").as("xl"))): _*)))
      .select(col("key"), col("x"), col("__l.lag").as("lag"), col("__l.xl").as("xl"))
    val den = base.join(stats, Seq("key"))
      .groupBy(col("key"))
      .agg(sum((col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")))
        .cast("long").as("den"))
    exploded.filter(col("xl").isNotNull)
      .join(stats, Seq("key"))
      .groupBy(col("key"), col("lag"))
      .agg(sum((col("n") * col("x") - col("s")) * (col("n") * col("xl") - col("s")))
        .cast("long").as("num"),
        count(lit(1)).as("n_terms"))
      .join(den, Seq("key"))
      .select(col("key"), col("lag"), col("num"), col("den"), col("n_terms"))
  }

  /** Exact exponentially weighted moving average with a DYADIC
    * smoothing factor α = 2^−`alphaExp`, truncated at `span` terms and
    * normalized over the weights actually present (the pandas
    * `adjust=True` convention). Clearing α(1−α)^i over the common
    * denominator 2^(α·span) gives INTEGER weights
    *   w_i = (2^a − 1)^i · 2^(a·(span−1−i)),   i = 0 .. span−1
    * so the smoothed level is the rational
    *   ewma_t = Σ x_{t−i}·w_i  /  Σ w_i        (non-null lags only)
    * emitted as `ewma_num` / `ewma_den` BIGINTs plus the truncating
    * fixed-point quotient `ewma_c = ewma_num div ewma_den` — every
    * value hash-certifiable, no float anywhere (the [[acf]] clearing
    * discipline applied to smoothing).
    *
    * One WindowExec partitioned by the HIGH-CARDINALITY series key
    * carries all `span` lags (single shuffle + per-key sort bounded by
    * series length); the weighted fold is a plain codegen projection.
    * Early rows (fewer than `span` predecessors) renormalize over the
    * lags they have — no warm-up nulls, matching adjust=True.
    *
    * Overflow contract: `alphaExp·span ≤ 62` caps every weight under
    * 2^62; Σw_i · max|x| must stay under 2^63 — feed centi-unit longs
    * ([[Regression.centiUnits]]), not raw micros. `valueCol` must
    * already be integral (LongType after cast).
    */
  def ewma(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
           alphaExp: Int, span: Int): DataFrame = {
    require(alphaExp >= 1, "alphaExp must be >= 1 (alpha = 2^-alphaExp)")
    require(span >= 1, "span must be >= 1")
    require(alphaExp.toLong * span <= 62,
      "alphaExp*span must be <= 62 to keep integer weights in a long")
    val odd = (1L << alphaExp) - 1
    def wt(i: Int): Long = {
      var p = 1L; var j = 0
      while (j < i) { p *= odd; j += 1 }
      p << (alphaExp * (span - 1 - i))
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val keep = df.columns.map(col)
    val lagCols = (0 until span).map { i =>
      val x = col(valueCol).cast("long")
      (if (i == 0) x else lag(x, i).over(w)).as(s"__g$i")
    }
    val withLags = df.select(keep ++ lagCols: _*)
    val num = (0 until span).map(i =>
      when(col(s"__g$i").isNotNull, col(s"__g$i") * lit(wt(i)))
        .otherwise(lit(0L))).reduce(_ + _)
    val den = (0 until span).map(i =>
      when(col(s"__g$i").isNotNull, lit(wt(i)))
        .otherwise(lit(0L))).reduce(_ + _)
    withLags
      .withColumn("ewma_num", num)
      .withColumn("ewma_den", den)
      .withColumn("ewma_c", expr("ewma_num div ewma_den"))
      .drop((0 until span).map(i => s"__g$i"): _*)
  }

  /** Time-weighted average (TWAP) over IRREGULAR samples: each sample
    * holds its value until the next one, so the average weights
    * values by their holding interval — the metric a row-count mean
    * gets wrong exactly when sampling is uneven (bursty telemetry,
    * trade ticks, config changes).
    *
    * Per key: samples ordered by (`tsCol`, tie on value for a total
    * order), each weighted by `next_ts − ts`; the LAST sample holds
    * until `horizonEnd` (exclusive; must be ≥ every ts). Samples
    * before the horizon start are the caller's filter. Exact integers:
    *   twap_micro = (Σ v·dt · 10⁶) div (Σ dt)
    * (values pre-scaled to integer units by the caller).
    *
    * Scale shape: one lead() window partitioned by the
    * high-cardinality key + one hash aggregate — the [[ewma]]
    * discipline; nothing global.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           horizonEnd: Long): DataFrame = {
    df.select(col(keyCol), col(tsCol).cast("long").as("__ts"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__ts").isNotNull && col("__v").isNotNull)
      .withColumn("__next",
        coalesce(lead(col("__ts"), 1).over(
          Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__v"))),
          lit(horizonEnd)))
      .withColumn("__dt",
        when(col("__next") - col("__ts") < 0,
          raise_error(lit("twap: horizonEnd precedes a sample timestamp")).cast("long"))
          .otherwise(col("__next") - col("__ts")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__dt")).as("held_sec"),
        sum(col("__v") * col("__dt")).as("vt_sum"))
      // ×10⁶ in DECIMAL(38,0): vt_sum is already ~value·horizon and the
      // micro scale-up overflows BIGINT long before the data is big
      .withColumn("twap_micro",
        expr("CAST((CAST(vt_sum AS DECIMAL(38,0)) * 1000000) div held_sec AS BIGINT)"))
  }

  /** Seasonal-naive forecast backtest with MASE ingredients, exact:
    * per key, "forecast" bucket t with the value one SEASON back
    * (x_{t−s}) and score it against the actual — the no-model baseline
    * every real forecaster must beat (Hyndman & Koehler 2006: MASE
    * scales a model's error by THIS error, so shipping the exact
    * ingredients lets any model be scored later without re-reading the
    * history). Per key:
    *   n_eval      rows with a t−s predecessor (the scorable window),
    *   sae_seasonal Σ|x_t − x_{t−s}|  (seasonal-naive absolute error),
    *   sae_naive    Σ|x_t − x_{t−1}| over the SAME scorable rows (the
    *                MASE denominator, in-window convention),
    * all BIGINT — mase = sae_seasonal/sae_naive is the caller's one
    * float division at the edge. Requires an integer-bucketed DENSE
    * series (run [[gapFill]] first if sparse: a lag over a gappy
    * series silently compares across holes).
    *
    * Scale shape: two lags on ONE window partitioned by the
    * high-cardinality series key + one hash aggregate — the [[ewma]]
    * discipline; nothing global.
    */
  def seasonalNaiveEval(df: DataFrame, keyCol: String, orderCol: String,
                        valueCol: String, season: Int): DataFrame = {
    require(season >= 2, "season must be >= 2 (season 1 IS the naive lag)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val x = col(valueCol).cast("long")
    df.select(col(keyCol), x.as("__x"),
        lag(x, season).over(w).as("__xs"),
        lag(x, 1).over(w).as("__x1"))
      .filter(col("__xs").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("__x") - col("__xs"))).as("sae_seasonal"),
        sum(abs(col("__x") - col("__x1"))).as("sae_naive"))
  }

  /** Holt linear (double-exponential) smoothing in deterministic
    * integer FIXED-POINT — the trend-aware upgrade of [[ewma]] for
    * series that drift (a plain EWMA lags a trending series forever).
    * Dyadic factors α = 2^−`alphaExp`, β = 2^−`betaExp`; the classic
    * recurrence with every division a truncating integer `div`:
    *   lvl_t = (x_t·2^0 + (2^a−1)·(lvl_{t−1} + tr_{t−1})) div 2^a
    *   tr_t  = ((lvl_t − lvl_{t−1}) + (2^b−1)·tr_{t−1}) div 2^b
    * seeded lvl_1 = x_1, tr_1 = 0. Truncation toward zero matches
    * every engine's integer division on the SAME inputs, so the whole
    * trajectory is bit-reproducible and hash-certifiable — the
    * [[graft.operators.Graphs.pageRank]] fixed-point convention
    * applied to smoothing (feed centi/micro-unit longs for precision).
    *
    * The recurrence is inherently sequential per key, so each key's
    * series rides ONE hash-aggregated `sort_array(collect_list(...))`
    * + a native higher-order `aggregate` fold — no window, no UDF, no
    * shuffle beyond the one groupBy on the high-cardinality key.
    * Per-task memory is one key's series (the [[ewma]] boundedness
    * contract: series length is bounded by the time range).
    *
    * Emits one row per input point: (key, ord, x, lvl, tr, err) where
    * `err` = x_t − (lvl_{t−1} + tr_{t−1}) is the one-step-ahead
    * forecast residual (0 for the seed row) — the anomaly-detection
    * readout. h-step forecasts are lvl_T + h·tr_T at the edge.
    */
  def holtSmooth(df: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, alphaExp: Int, betaExp: Int): DataFrame = {
    require(alphaExp >= 1 && alphaExp <= 30, "alphaExp in 1..30")
    require(betaExp >= 1 && betaExp <= 30, "betaExp in 1..30")
    val a = 1L << alphaExp
    val b = 1L << betaExp
    val packed = df
      .select(col(keyCol),
        struct(col(orderCol).cast("long").as("o"),
          col(valueCol).cast("long").as("x")).as("__p"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__p"))).as("__pts"))
    // fold state: (lvl, tr, out rows so far); seed from the first point
    packed.select(col(keyCol), expr(
      s"""
       aggregate(
         slice(__pts, 2, size(__pts) - 1),
         named_struct(
           'lvl', __pts[0].x, 'tr', CAST(0 AS BIGINT),
           'rows', array(named_struct(
             'o', __pts[0].o, 'x', __pts[0].x,
             'lvl', __pts[0].x, 'tr', CAST(0 AS BIGINT),
             'err', CAST(0 AS BIGINT)))),
         (acc, p) -> named_struct(
           'lvl', (p.x + ${a - 1} * (acc.lvl + acc.tr)) div $a,
           'tr', ((((p.x + ${a - 1} * (acc.lvl + acc.tr)) div $a) - acc.lvl)
                   + ${b - 1} * acc.tr) div $b,
           'rows', array_append(acc.rows, named_struct(
             'o', p.o, 'x', p.x,
             'lvl', (p.x + ${a - 1} * (acc.lvl + acc.tr)) div $a,
             'tr', ((((p.x + ${a - 1} * (acc.lvl + acc.tr)) div $a) - acc.lvl)
                     + ${b - 1} * acc.tr) div $b,
             'err', p.x - (acc.lvl + acc.tr)))),
         acc -> acc.rows) AS __out
      """))
      .select(col(keyCol), explode(col("__out")).as("__r"))
      .select(col(keyCol), col("__r.o").as(orderCol), col("__r.x").as("x"),
        col("__r.lvl").as("lvl"), col("__r.tr").as("tr"),
        col("__r.err").as("err"))
  }
}
