package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Papadopoulos et al. 2002;
  * Lei et al. JASA 2018) — DISTRIBUTION-FREE interval widths for a
  * point predictor: fit on a train split, score absolute residuals on
  * a held-out calibration split, and the ⌈(1−α)(n_cal+1)⌉-th smallest
  * residual is a half-width with finite-sample ≥ 1−α coverage for any
  * data distribution. The honest uncertainty readout an ML-adjacent
  * pipeline wants next to [[Regression.groupedOls]]'s point fits —
  * no normality assumption, no variance formula, just exchange-
  * ability of the calibration rows.
  *
  * Exactness: the fit reuses [[Regression.groupedOls]]'s certified
  * fixed-IEEE coefficient shape; residuals derive through one fixed
  * IEEE expression (−, ·, abs — correctly rounded everywhere) and
  * QUANTIZE to integer tenth-milli units via floor (bit-identical
  * cross-engine on doubles), so the order statistic an engine selects
  * is an exact integer — the interval hash-certifies. Quantization
  * only coarsens the width by < 1 quantum (conservative either way
  * at 10⁻⁴ of a value unit; pick the metric's fixed-point scale so
  * that's immaterial).
  *
  * Scale shape: one hash-aggregate fit pass (train), one residual
  * map pass against the BROADCAST group-cardinality coefficient
  * table (calibration), then [[Quantiles]]' GK-bracketed two-pass
  * exact selection — no per-group sort anywhere; the only window
  * rides bracket rows (O(n/accuracy) per group). The conformal rank
  * arithmetic ((n+1)·(aD−aN)+aD−1) stays under 2⁵³, exact through
  * the double floor, for any n_cal below ~4·10¹⁴.
  */
object Conformal {

  /** Per-group split-conformal OLS interval. `splitCol` must be 0
    * (train) / 1 (calibration) — derive it from a deterministic hash
    * upstream, never an RNG (the q47 convention). `xCol`/`yCol` are
    * fixed-point integers. α = alphaNum/alphaDen.
    *
    * Output per group: `n_train, n_cal, slope, intercept,
    * k_rank, half_width_q` — half_width_q in tenth-milli units
    * (floor(|resid|·10⁴)); groups whose train split is degenerate
    * (den = 0 → null slope) are dropped, as are groups with an empty
    * calibration split.
    *
    * MINIMUM CALIBRATION SIZE: the finite-sample guarantee needs
    * ⌈(1−α)(n_cal+1)⌉ ≤ n_cal, i.e. n_cal ≥ ⌈1/α⌉ − 1 (9 at α = 0.1,
    * 19 at α = 0.05). Below that no order statistic covers at 1−α —
    * the honest interval is infinite — so `half_width_q` is NULL
    * (never the clamped max residual, which would silently under-
    * cover) while `k_rank` still reports the required rank.
    */
  def splitConformalOls(df: DataFrame, groupCol: String, splitCol: String,
                        xCol: String, yCol: String,
                        alphaNum: Long = 1L, alphaDen: Long = 10L,
                        accuracy: Int = 10000): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"need 0 < alpha < 1, got $alphaNum/$alphaDen")
    val fit = Regression
      .groupedOls(df.filter(col(splitCol) === 0), groupCol, xCol, yCol)
      .where(col("slope").isNotNull)
      .select(col(groupCol), col("n").as("n_train"),
        col("slope"), col("intercept"))
    val resid = df.filter(col(splitCol) === 1)
      .join(broadcast(fit), Seq(groupCol))
      .withColumn("resid_q",
        floor(abs(col(yCol).cast("double") -
          (col("intercept") + col("slope") * col(xCol).cast("double")))
          * lit(10000.0)).cast("long"))
    val aN = alphaNum; val aD = alphaDen
    val covP = (aD - aN).toDouble / aD
    val cut = Quantiles.exactRankByGroupImpl(
      resid, groupCol, "resid_q",
      // k = ⌈(1−α)(n+1)⌉ = ((n+1)(aD−aN) + aD−1) div aD; the rational
      // is 1/aD away from any integer, far beyond double ulp, so the
      // double floor is the exact integer division
      kOf = n => floor(((n + lit(1L)) * lit(aD - aN) + lit(aD - 1L))
        .cast("double") / lit(aD.toDouble)).cast("long"),
      pLo = covP - 2.0 / accuracy, pHi = covP + 2.0 / accuracy,
      accuracy = accuracy)
    val nCal = resid.groupBy(col(groupCol)).agg(count(lit(1)).as("n_cal"))
    fit.join(nCal, Seq(groupCol)).join(cut, Seq(groupCol))
      // the UNCLAMPED conformal rank: when it exceeds n_cal the honest
      // 1−α interval is infinite — clamping to the max residual would
      // silently drop the coverage guarantee, so half_width_q goes NULL
      // instead (k_rank still reports the required rank, so callers see
      // by how much the calibration split fell short)
      .withColumn("k_rank",
        floor(((col("n_cal") + lit(1L)) * lit(aD - aN) + lit(aD - 1L))
          .cast("double") / lit(aD.toDouble)).cast("long"))
      .select(col(groupCol), col("n_train"), col("n_cal"),
        col("slope"), col("intercept"), col("k_rank"),
        when(col("k_rank") <= col("n_cal"), col("cut").cast("long"))
          .as("half_width_q"))
  }
}
