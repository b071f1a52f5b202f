package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data validation with quarantine — the engine-side analogue
  * of the loader's bad-record envelope (the reference surfaces COPY's
  * error semantics as `maxerror`/failed-batch routing:
  * `/root/reference/README.md` COPY options and the failed-manifest
  * path; Redshift itself reports per-row causes in stl_load_errors).
  * Batch admission gave a file-level verdict; this gives the ROW-level
  * one: which rows are malformed, why, and a clean/quarantine split so
  * a load never silently drops or silently admits.
  *
  * A rule is a named boolean predicate over columns (TRUE = pass).
  * Everything is a projection — violations annotate each row as an
  * array of failed rule names, the split is two filters of one
  * annotated frame, and the profile contracts per rule with ONE
  * map-side-combined aggregate (no shuffle of data rows, no
  * per-rule scan). Stateless ⇒ streams in append mode unchanged.
  */
object Validate {

  /** A named validation rule; `pred` must evaluate TRUE for valid
    * rows. Null predicate results count as VIOLATIONS (SQL three-value
    * logic would otherwise let `null_col > 0` rows slip both sides).
    */
  final case class Rule(name: String, pred: Column)

  /** Annotate every row with `violations` (names of failed rules, in
    * rule order) and `valid`. One projection; no shuffle. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // loud, not silent: withColumn would CLOBBER caller columns with
    // the reserved output names, and split() would then drop them
    require(!df.columns.contains("violations") && !df.columns.contains("valid"),
      "input already has a 'violations' or 'valid' column")
    val fails = rules.map(r =>
      when(coalesce(r.pred, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name)))
    df.withColumn("violations",
        filter(array(fails: _*), c => c.isNotNull))
      .withColumn("valid", size(col("violations")) === 0)
  }

  /** (clean, quarantine) — two filters over one annotated frame; the
    * clean side drops the annotation columns, the quarantine side
    * keeps them (they ARE the error report). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(col("valid")).drop("violations", "valid"),
      a.filter(!col("valid")))
  }

  /** Per-rule violation profile: one aggregate row per rule plus row /
    * clean totals, from a SINGLE pass (sum-of-indicators, map-side
    * combined — the scan never shuffles). */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val a = annotate(df, rules)
    // internal aliases are INDEX-based: a rule name with a dot or
    // backtick is data here, never a column-path to re-parse
    val aggs =
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(array_contains(col("violations"), r.name), 1L)
          .otherwise(0L)).as(s"__v_$i") } ++
      Seq(count(lit(1)).as("__rows"),
        sum(when(col("valid"), 1L).otherwise(0L)).as("__clean"))
    val one = a.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v_$i").as("n_violations")) }
    one.select(explode(array(pairs: _*)).as("p"),
        col("__rows").as("n_rows"), col("__clean").as("n_clean"))
      .select(col("p.rule"), col("p.n_violations").cast("long").as("n_violations"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_clean").cast("long").as("n_clean"))
  }

  /** Benford micro-probabilities: ⌊log10(1 + 1/d)·10⁶⌋ for d = 1..9 —
    * fixed rational CONSTANTS, so no engine evaluates a log and the
    * whole audit stays integer-exact. */
  val BenfordMicro: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L,
      51152L, 45757L)

  /** Benford first-significant-digit audit — the fraud/corruption
    * screen for any naturally-scaled positive measure (amounts, sizes,
    * populations): per digit d ∈ 1..9, the observed count, the
    * Benford-expected count in micro-units (n · p_d·10⁶, exact
    * BIGINT), and the signed deviation `dev_micro` =
    * n_d·10⁶ − n·p_d·10⁶ — the χ² ingredients left un-squared and
    * un-divided so every value is an exact integer (squaring would
    * pass 2^63 at corpus scale; callers square/divide at presentation
    * size, i.e. over 9 rows).
    *
    * First digit via string arithmetic on the integral part (no
    * float log): non-positive and null values are filtered out (they
    * have no Benford digit), sub-1 values take their first nonzero
    * fractional digit. One map + one 9-bucket hash aggregate — the
    * scan never shuffles more than 9 partial rows per task.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    // first significant digit via string arithmetic on the value
    // quantized to DECIMAL(38,6) — both engines render that scale in
    // plain notation ("0.005000", "123.450000"), so stripping zeros
    // and the point leaves the lead digit with no log10 and no
    // format-locale hazard. Values that quantize to 0 drop out with
    // the nonpositive rows (no Benford digit).
    val digit = substring(
      regexp_replace(abs(col(valueCol)).cast("decimal(38,6)").cast("string"),
        "[0.]", ""), 1, 1).cast("int")
    val counts = df
      .filter(col(valueCol).isNotNull && abs(col(valueCol)) > 0)
      .select(digit.as("digit"))
      .filter(col("digit").isNotNull)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val expect = df.sparkSession.createDataFrame(
      BenfordMicro.zipWithIndex.map { case (p, i) => ((i + 1), p) })
      .toDF("digit", "p_micro")
    expect
      .join(counts, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(counts.agg(sum(col("n_obs")).cast("long").as("__n")))
      .select(col("digit"), col("n_obs"),
        (col("__n") * col("p_micro")).as("expected_micro"),
        (col("n_obs") * lit(1000000L) - col("__n") * col("p_micro"))
          .as("dev_micro"))
  }
}
