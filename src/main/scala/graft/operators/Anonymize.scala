package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity by suppression (Sweeney 2002): rows whose
  * quasi-identifier combination is shared by fewer than `k` rows are
  * re-identifiable; suppressing their quasi-identifier values makes
  * every released combination ambiguous among ≥ k rows (the suppressed
  * rows collapse into one maximal group). The privacy complement to
  * the value-level PII scrub ([[graft.functions.Curation.redactPii]],
  * q40): PII redaction removes DIRECT identifiers, k-anonymity bounds
  * LINKAGE risk through quasi-identifiers.
  *
  * Scale design (100 TB): group sizes are one map-side-partial hash
  * aggregate on the quasi columns joined back on the same key — two
  * shuffles on a well-spread composite key, no window (a QI window
  * would put a hot demographic in one task). Suppression itself is a
  * codegen'd projection.
  */
object Anonymize {

  private val Redacted = "*"

  /** Suppress quasi-identifier STRING columns of rows in groups
    * smaller than `k` (replaced by `"*"`); non-quasi columns pass
    * through. Adds `suppressed` (boolean). Quasi columns must be
    * strings — cast/bucket numeric quasis first (binning is itself a
    * generalization step; see [[Quantiles.bucketAssign]]).
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__qi_n"))
    // null-safe keys: groupBy puts null quasi values in their own group,
    // so the join back must match them too (a plain equi-join would give
    // null-QI rows no size and silently exempt them from suppression)
    val renamed = quasiCols.foldLeft(sizes)((d, c) =>
      d.withColumnRenamed(c, s"__qi_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__qi_$c")).reduce(_ && _)
    val joined = df.join(renamed, cond, "left")
    val small = col("__qi_n") < k
    val out = df.columns.map {
      case c if quasiCols.contains(c) =>
        when(small, lit(Redacted)).otherwise(col(c)).as(c)
      case c => col(c)
    } :+ small.as("suppressed")
    joined.select(out: _*)
  }

  /** Release-risk profile: row/group counts, the k-violating share,
    * and the worst re-identification probability (1 / smallest group
    * size) before suppression.
    */
  def profile(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("n_rows_at_risk"),
        min(col("n")).as("min_group_size"))
      .withColumn("max_reident_risk",
        lit(1.0) / col("min_group_size"))

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006): k-anonymity
    * bounds GROUP size but a group whose sensitive attribute is
    * uniform still leaks it ("homogeneity attack" — all 40-year-olds
    * in zip 021* have the same diagnosis). Distinct l-diversity
    * requires every quasi-identifier group to carry ≥ l DISTINCT
    * sensitive values. Per group: size `n`, `n_sensitive` (exact
    * distinct), the most frequent sensitive value's count `max_freq`
    * (the disclosure odds numerator — max_freq/n is the adversary's
    * best guess), and `diverse` = n_sensitive ≥ l.
    *
    * Scale shape: one (quasi × sensitive) pre-aggregate feeding one
    * quasi-level aggregate — distinct counting WITHOUT count_distinct's
    * expand, and the same two-level contraction handles the max_freq
    * readout for free. Both shuffles ride composite keys; no window.
    * Null sensitive values count as one distinct value (a group of
    * all-null sensitives is NOT diverse — nulls leak too).
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 1, "l must be >= 1")
    val qi = quasiCols.map(col)
    df.groupBy(qi :+ col(sensitiveCol).as("__sv"): _*)
      .agg(count(lit(1)).as("__sn"))
      .groupBy(qi: _*)
      .agg(sum(col("__sn")).cast("long").as("n"),
        count(lit(1)).as("n_sensitive"),
        max(col("__sn")).as("max_freq"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}
