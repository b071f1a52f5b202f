package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise ordinary least squares through sufficient statistics —
  * trend detection over grouped series (per-source quality drift,
  * per-event-type value trends) as ONE aggregation pass.
  *
  * OLS on (x, y) needs only the five sufficient statistics
  * (n, Σx, Σy, Σx², Σxy):
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * all of which are plain commutative sums — a map-side-partial hash
  * aggregate with a single shuffle on the group key, no window, no
  * sort, no second pass. That is the whole 100 TB story: the operator
  * costs exactly what `groupBy().sum()` costs, at any group skew.
  *
  * Exactness contract (the q73/q87 integer-skeleton convention): x and
  * y enter as BIGINTs (callers scale doubles to fixed-point first —
  * see [[Regression.microUnits]]), so the five statistics are
  * integer-exact and hash-certifiable. The slope/intercept doubles are
  * then derived from those integers by a FIXED expression shape
  * (each statistic cast to double, then ·, −, / in one order);
  * IEEE 754 arithmetic is exactly rounded, so two engines computing
  * the same shape over the same integers produce bit-identical
  * doubles — the floats are as certifiable as the integers.
  *
  * Magnitude guard: each statistic must individually fit a BIGINT —
  * sums are exact there. The slope arithmetic (n·Σxy up to ~1e21)
  * deliberately happens in DOUBLE, where it is rounded but
  * deterministic; keeping it integer would overflow i64 silently in
  * non-ANSI engines. Callers bound |x| by anchoring (e.g. days since
  * a corpus epoch, not epoch seconds) — [[dayIndex]] is the standard
  * anchor.
  */
object Regression {

  /** Fixed-point micro-units: exact BIGINT from a double column via
    * the repo's decimal(18,6) convention (deterministic on both
    * engine and oracle sides; the decimal is integer-valued after the
    * ×1e6, so the cast is exact, never a round-vs-truncate trap).
    */
  def microUnits(c: Column): Column =
    (c.cast("decimal(18,6)") * lit(1000000L)).cast("bigint")

  /** Centi-unit fixed point (×100, exact for 2-decimal money-like
    * values). Prefer this over [[microUnits]] when downstream squares
    * the values ([[ABTest]], variances): it keeps Σv² under 2^53 —
    * exactly representable, so the decimal→double cast is EXACT in
    * every engine. Above 2^53 Spark's cast is correctly rounded but
    * e.g. DuckDB's hugeint→double conversion double-rounds, drifting
    * one ulp (measured on q129 at sf0.1 with micro-units).
    */
  def centiUnits(c: Column): Column =
    (c.cast("decimal(18,2)") * lit(100L)).cast("bigint")

  /** Days since 2024-01-01 (the test corpus epoch) as a small exact
    * integer x — bounds n·Σxy within double's deterministic range.
    */
  def dayIndex(ts: Column): Column =
    datediff(ts.cast("date"), lit("2024-01-01").cast("date")).cast("bigint")

  /** Per-group OLS over integer (x, y): returns one row per group with
    * the exact sufficient statistics (n, sx, sy, sxx, sxy — BIGINT)
    * and the derived slope/intercept (DOUBLE, fixed expression shape).
    * Groups where x is constant (zero variance ⇒ undefined slope)
    * return null slope/intercept rather than ±Inf.
    */
  /** Theil-Sen robust trend slope per series key — the median of all
    * pairwise slopes, immune to the outlier days that drag
    * [[groupedOls]] (breakdown point 29% vs 0%). Slopes ride the
    * repo's integer clearing: `slope_micro = (10⁶·Δx) div Δt` (exact
    * floor, deterministic on any engine), and the per-key median is
    * [[Quantiles.exactQuantileByGroup]]'s bracketed exact selection —
    * no per-key window over the full pair set, and group keys of ANY
    * cardinality skew safely.
    *
    * Contract: pairs are per-key quadratic — this is for CONTRACTED
    * series (daily/hourly rollups, hundreds of points), the same
    * shape [[graft.operators.TimeSeries.acf]] and [[groupedOls]]
    * consume, not raw event streams. Returns
    * `(key, n_pairs, slope_micro)` with the lower median (k =
    * ⌈n/2⌉-th smallest — a total order, ties included).
    */
  def theilSen(df: DataFrame, keyCol: String, tCol: String,
               xCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
    val slopes = base.select(col("key"), col("t").as("ta"), col("x").as("xa"))
      .join(base.select(col("key"), col("t").as("tb"), col("x").as("xb")), Seq("key"))
      .filter(col("ta") < col("tb"))
      .select(col("key"),
        expr("(1000000L * (xb - xa)) div (tb - ta)").as("slope_micro"))
      // the quadratic pair join is consumed four times (bracket stats,
      // bracket verify, selection, n_pairs) — materialize it once
      .localCheckpoint()
    val medians = Quantiles.exactQuantileByGroup(slopes, "key", "slope_micro",
      p = 0.5)
    slopes.groupBy(col("key")).agg(count(lit(1)).as("n_pairs"))
      .join(medians, Seq("key"))
      .select(col("key"), col("n_pairs"),
        col("cut").cast("long").as("slope_micro"))
  }

  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("bigint")
    val y = col(yCol).cast("bigint")
    val agg = df
      .where(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(y).as("sy"),
        sum(x * x).as("sxx"),
        sum(x * y).as("sxy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    agg
      .withColumn("num0", num).withColumn("den0", den)
      .withColumn("slope", when(col("den0") =!= 0.0, col("num0") / col("den0")))
      .withColumn("intercept",
        when(col("den0") =!= 0.0, (syD - col("slope") * sxD) / nD))
      .drop("num0", "den0")
  }

  /** Per-group pairwise Pearson correlation matrix over k integer
    * metric columns, in ONE hash aggregate: k sums, k sums of squares,
    * and k·(k−1)/2 cross sums — all map-side-partial, one shuffle on
    * the group key, no window, skew-immune (the [[groupedOls]] plan).
    *
    * Magnitude: micro-unit squares reach ~1e22 — past BIGINT — so the
    * quadratic statistics accumulate as decimal(38,0) (Spark sums
    * decimals exactly; the DuckDB oracle's HUGEINT/decimal sums match
    * digit for digit to ~1e38) and are emitted as DOUBLE — one
    * correctly-rounded conversion of an exact sum, deterministic on
    * both engines, avoiding cross-engine decimal stringification
    * skew. Linear sums stay BIGINT. Each r is then derived by a fixed
    * IEEE shape FROM THE OUTPUT COLUMNS
    * ((n·Σxy − Σx·Σy) / √((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))),
    * so the doubles hash-match too. Zero-variance columns yield null r
    * for their pairs, never ±Inf/NaN. Rows with a null in ANY metric
    * are dropped first (one consistent n for the whole matrix —
    * listwise deletion, the standard correlation-matrix contract).
    *
    * Correlation is invariant under positive affine maps, so any exact
    * fixed-point scaling ([[microUnits]]) leaves r equal to the
    * unscaled ideal — scaling is purely an exactness device.
    */
  def corrMatrix(df: DataFrame, groupCol: String,
                 valueCols: Seq[String]): DataFrame = {
    require(valueCols.size >= 2, "need at least two metric columns")
    val pairs = for {
      i <- valueCols.indices; j <- valueCols.indices if i < j
    } yield (valueCols(i), valueCols(j))
    def dec(c: String): Column = col(c).cast("bigint").cast("decimal(19,0)")
    val nonNull = valueCols.map(col(_).isNotNull).reduce(_ && _)
    val aggs: Seq[Column] =
      valueCols.map(c => sum(col(c).cast("bigint")).as(s"s_$c")) ++
      valueCols.map(c =>
        sum(dec(c) * dec(c)).cast("double").as(s"ss_$c")) ++
      pairs.map { case (a, b) =>
        sum(dec(a) * dec(b)).cast("double").as(s"sp_${a}_$b") }
    val agg = df.where(nonNull).groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast("double")
    def varD(c: String): Column =
      nD * col(s"ss_$c") -
        col(s"s_$c").cast("double") * col(s"s_$c").cast("double")
    pairs.foldLeft(agg) { case (d, (a, b)) =>
      val num = nD * col(s"sp_${a}_$b") -
        col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
      d.withColumn(s"corr_${a}_$b",
        when(varD(a) > 0.0 && varD(b) > 0.0, num / sqrt(varD(a) * varD(b))))
    }
  }
}
