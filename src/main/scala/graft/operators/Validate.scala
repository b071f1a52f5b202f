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
}
