package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample experiment readout — per metric group, Welch's unequal-
  * variance t statistic between two arms (Welch 1947; the standard
  * A/B-test readout when arm variances differ). Extends the
  * evaluation family ([[Regression]] trends, [[Outliers]] robust
  * flags, [[Drift]] distribution monitoring) with the
  * treatment-vs-control comparison.
  *
  * Exactness contract (the [[Regression]] convention): values enter
  * as fixed-point BIGINTs ([[Regression.microUnits]]); per arm the
  * sufficient statistics (n, Σv as BIGINT, Σv² as decimal(38,0)) are
  * integer-exact off ONE map-side-partial hash aggregate — no window,
  * no second pass, skew-immune. Means, variances, t, and the
  * Welch–Satterthwaite df then derive through a FIXED IEEE expression
  * shape (+, −, ·, /, sqrt are all correctly rounded), so the doubles
  * hash-certify engine-to-engine like the q98/q109 floats. No
  * ln/exp/erf anywhere — p-values are left to the caller's CDF tables
  * precisely because libm transcendentals are NOT cross-engine
  * reproducible.
  *
  * Magnitude rule for cross-engine certification: pick the
  * fixed-point scale so Σv² stays under 2^53 — then the
  * decimal→double cast is EXACT everywhere. Above 2^53 Spark's cast
  * is still correctly rounded, but engines whose decimal/hugeint →
  * double conversion double-rounds (measured: DuckDB) drift one ulp
  * (use [[Regression.centiUnits]], not micro, for 2-decimal metrics).
  */
object ABTest {

  /** Per-group Welch readout. `armCol` must be 0/1 (cast/bucket
    * upstream); `valueCol` must already be fixed-point BIGINT. Output:
    * `group, n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    * df_welch` — t/df null when either arm has < 2 observations or
    * both variances are zero.
    */
  def welch(df: DataFrame, groupCol: String, armCol: String,
            valueCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val v = col(valueCol)
    val isB = col(armCol) === 1
    val agg = df
      .where(v.isNotNull && (col(armCol) === 0 || isB))
      .groupBy(col(groupCol))
      .agg(
        sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(when(!isB, v)), lit(0L)).cast("long").as("s_a"),
        coalesce(sum(when(isB, v)), lit(0L)).cast("long").as("s_b"),
        coalesce(sum(when(!isB, dec(v) * dec(v))), lit(0L))
          .cast("double").as("ss_a"),
        coalesce(sum(when(isB, dec(v) * dec(v))), lit(0L))
          .cast("double").as("ss_b"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val saD = col("s_a").cast("double"); val sbD = col("s_b").cast("double")
    val meanA = saD / naD; val meanB = sbD / nbD
    val varA = (col("ss_a") - saD * saD / naD) / (naD - 1.0)
    val varB = (col("ss_b") - sbD * sbD / nbD) / (nbD - 1.0)
    val seA = varA / naD; val seB = varB / nbD
    val se2 = seA + seB
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0.0
    agg
      .withColumn("mean_a", meanA).withColumn("mean_b", meanB)
      .withColumn("var_a", when(col("n_a") >= 2, varA))
      .withColumn("var_b", when(col("n_b") >= 2, varB))
      .withColumn("t_stat", when(ok, (meanA - meanB) / sqrt(se2)))
      .withColumn("df_welch", when(ok,
        (se2 * se2) / (seA * seA / (naD - 1.0) + seB * seB / (nbD - 1.0))))
  }
}
