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
}
