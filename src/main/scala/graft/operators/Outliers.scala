package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection: median / MAD z-scores per group.
  *
  * The classic mean±k·stddev rule breaks on exactly the data it is
  * supposed to find — a handful of extreme values drag the mean toward
  * themselves and inflate the stddev, masking the outliers (and one
  * corrupt 1e308 poisons the whole group). The robust form uses the
  * per-group MEDIAN as the center and the median absolute deviation
  * (MAD = median of |v − med|) as the spread; both have a 50%
  * breakdown point, so flagging is stable until half the group is
  * corrupt (Hampel 1974; Leys et al. 2013 recommend |v − med| > k·MAD
  * with k = 3 as the standard conservative cut).
  *
  * Scale shape: both medians run through
  * [[Quantiles.exactMedianByGroup]] — the GK-bracketed two-pass EXACT
  * selection (no per-group single-task sort; the only window rides the
  * bracket contraction, plan-pinned in PlanAuditSpec). The per-group
  * (med, mad) tables are group-cardinality-sized and broadcast back,
  * so row flagging adds no shuffle to the scan: the whole operator is
  * four aggregation passes + two broadcast joins regardless of group
  * skew. Deviations are exact IEEE arithmetic on both engine and
  * oracle sides (`abs(v − med)` of the same doubles), so the flags —
  * and the hash — are reproducible bit-for-bit.
  *
  * Reference semantics: the loader profiles per-batch load metrics for
  * anomalous files (`README.md` "Viewing Previous Batches"
  * operational checks); this is that profiling pass made robust and
  * group-wise.
  */
object Outliers {

  /** Row-level robust profile: every input row with its group's exact
    * lower median `med`, `mad` (lower median of |v − med|), the row's
    * absolute deviation `dev`, and `is_outlier` = dev > k·MAD.
    *
    * MAD = 0 (more than half the group shares one value) flags ONLY
    * rows off the shared value when k > 0 — the standard convention:
    * any nonzero deviation from a majority-constant group is anomalous.
    * Null values are excluded (the underlying median excludes them and
    * a null deviation has no rank); null group keys likewise (the
    * median operator's documented null-group contract).
    */
  def robustProfile(df: DataFrame, groupCol: String, valueCol: String,
                    k: Double = 3.0, accuracy: Int = 10000): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.where(v.isNotNull && g.isNotNull)

    val med = Quantiles.exactMedianByGroup(base, groupCol, valueCol, accuracy)
      .withColumnRenamed("cut", "med")
    val withMed = base.join(broadcast(med), groupCol)
      .withColumn("dev", abs(v - col("med")))

    val mad = Quantiles.exactMedianByGroup(
        withMed.select(g, col("dev")), groupCol, "dev", accuracy)
      .withColumnRenamed("cut", "mad")

    withMed.join(broadcast(mad), groupCol)
      .withColumn("is_outlier", col("dev") > lit(k) * col("mad"))
  }
}
