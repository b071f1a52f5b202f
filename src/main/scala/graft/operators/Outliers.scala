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
  * four aggregation passes + broadcast joins regardless of group skew.
  * Deviations are exact IEEE arithmetic on both engine and oracle
  * sides (`abs(v − med)` of the same doubles), so the flags — and the
  * hash — are reproducible bit-for-bit.
  *
  * Reference semantics: the loader profiles per-batch load metrics for
  * anomalous files (`README.md` "Viewing Previous Batches"
  * operational checks); this is that profiling pass made robust and
  * group-wise.
  */
object Outliers {

  /** The per-group threshold table — `(group, med, mad)`, one row per
    * group: med is the exact lower median of the values, mad the exact
    * lower median of |v − med|. This is also the STORED form: compute
    * it on yesterday's batch, save it, and score today's stream
    * against it with [[flagAgainstProfile]] (the stored-model pattern
    * of DedupIndex / NgramLM / Bm25Index applied to anomaly gating).
    *
    * Null values and null group keys are excluded (the underlying
    * median's documented null contract).
    */
  def thresholds(df: DataFrame, groupCol: String, valueCol: String,
                 accuracy: Int = 10000): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.where(v.isNotNull && g.isNotNull)
    val med = Quantiles.exactMedianByGroup(base, groupCol, valueCol, accuracy)
      .withColumnRenamed("cut", "med")
    val devs = base.join(broadcast(med), groupCol)
      .select(g, abs(v - col("med")).as("dev"))
    val mad = Quantiles.exactMedianByGroup(devs, groupCol, "dev", accuracy)
      .withColumnRenamed("cut", "mad")
    med.join(mad, groupCol)
  }

  /** Score rows against a `(group, med, mad)` profile: a stream-static
    * (or batch-batch) broadcast join + IEEE arithmetic — stateless, so
    * it runs unchanged under Structured Streaming micro-batches, and
    * flags agree bit-for-bit with the batch path over the same
    * thresholds. Rows whose group has no stored profile pass with
    * `is_outlier` = false (fail-open, the admission-filter convention —
    * an unknown group is new data, not an anomaly).
    */
  def flagAgainstProfile(rows: DataFrame, profile: DataFrame,
                         groupCol: String, valueCol: String,
                         k: Double = 3.0): DataFrame =
    rows.join(broadcast(profile), Seq(groupCol), "left")
      .withColumn("dev", abs(col(valueCol) - col("med")))
      .withColumn("is_outlier",
        coalesce(col("dev") > lit(k) * col("mad"), lit(false)))

  /** Row-level robust profile in one shot: every input row with its
    * group's exact `med` and `mad`, the row's absolute deviation
    * `dev`, and `is_outlier` = dev > k·MAD.
    *
    * MAD = 0 (more than half the group shares one value) flags ONLY
    * rows off the shared value when k > 0 — the standard convention:
    * any nonzero deviation from a majority-constant group is
    * anomalous. Null values and null group keys are excluded.
    */
  def robustProfile(df: DataFrame, groupCol: String, valueCol: String,
                    k: Double = 3.0, accuracy: Int = 10000): DataFrame = {
    val base = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
    flagAgainstProfile(base, thresholds(df, groupCol, valueCol, accuracy),
      groupCol, valueCol, k)
  }
}
