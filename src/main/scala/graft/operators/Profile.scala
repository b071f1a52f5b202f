package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level table profiling — the "analyze this table" pass every
  * warehouse and data-quality tool runs before anything else (the
  * reference profiles batches operationally via `describeBatch` /
  * "Viewing Previous Batches" in `README.md`; this is that health
  * check generalized to per-column statistics, the Deequ/Great-
  * Expectations analyzer shape).
  *
  * Two shapes, one contract (`(column, n, n_null, n_distinct, min_s,
  * max_s)`, values canonicalized to strings so heterogeneous columns
  * stack into one result):
  *
  *  - [[summarize]] — EXACT. One single-row aggregate per column,
  *    unioned. k columns ⇒ k jobs, but each scans ONE column of a
  *    columnar table (parquet `ReadSchema` prunes to it), and each
  *    per-column distinct is a two-level hash aggregate (partial
  *    distinct per partition, then merge) — never a row-multiplying
  *    Expand, which is what a multi-column `countDistinct` in a
  *    single aggregate would cost (the q29 lesson: one Expand per
  *    distinct column ⇒ k× the scan in shuffled rows).
  *  - [[summarizeApprox]] — ONE pass for all columns: HLL
  *    `approx_count_distinct` per column are ordinary mergeable
  *    aggregates (no Expand), so the whole profile costs a single
  *    column-complete scan + one partial-combining aggregate. The
  *    100 TB default; rsd defaults to HLL's 0.05 and the spec pins
  *    the estimates inside 3·rsd of [[summarize]]'s exact counts.
  *
  * Caller canonicalization contract: values are rendered with Spark's
  * string cast. Integers, strings, and dates render identically across
  * engines; floating-point columns should be pre-scaled to integer
  * units (e.g. [[Regression.centiUnits]]) by the caller if the profile
  * must hash-certify cross-engine.
  */
object Profile {

  private val schemaCols =
    Seq("column", "n", "n_null", "n_distinct", "min_s", "max_s")

  /** Exact per-column profile: one row per requested column. */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n"),
          // coalesce: an EMPTY table profiles as zeros, not nulls
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .withColumn("column", lit(c))
        .select(schemaCols.map(col): _*)
    }.reduce(_.unionByName(_))
  }

  /** One-pass approximate profile: exact n / n_null / min / max, HLL
    * distinct estimates (`rsd` relative standard error). Self-asserts
    * nothing by itself — compose with [[summarize]] on a sample or pin
    * with the 3·rsd envelope in tests.
    */
  def summarizeApprox(df: DataFrame, cols: Seq[String],
                      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__null_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // pivot the single wide row into the per-column contract: the
    // result is k rows from a 1-row input — pure projection, no job
    // per column
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(perCol: _*)).as("r"))
      .select(schemaCols.map(c => col(s"r.$c").as(c)): _*)
  }

  /** Functional-dependency discovery over ordered column pairs — the
    * profiling question "does A determine B?" (key detection,
    * denormalization audit, join-key validation): `A → B` holds iff
    * every distinct A value pairs with exactly one B value, i.e.
    * |distinct(A, B)| = |distinct(A)|. Violations are counted
    * exactly (`n_violations` = Σ_A (distinct B per A − 1)), so "almost
    * an FD" is visible, not just the boolean.
    *
    * Scale shape, per pair: one hash aggregate contracts to distinct
    * (A, B) — the corpus's row count never matters again — then one
    * count per A. Nulls participate as ordinary values (the standard
    * FD-profiling convention; filter first for the SQL-semantics
    * variant). k columns ⇒ k·(k−1) independent pair jobs over
    * column-pruned scans, embarrassingly parallel.
    */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    pairs.map { case (a, b) =>
      val ab = df.select(col(a).as("__a"), col(b).as("__b")).distinct()
      ab.groupBy(col("__a")).agg(count(lit(1)).as("nb"))
        .agg(count(lit(1)).as("n_distinct_det"),
          coalesce(sum(col("nb") - 1L), lit(0L)).as("n_violations"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_distinct_det"),
          col("n_violations"),
          (col("n_violations") === 0L).as("fd_holds"))
    }.reduce(_.unionByName(_))
  }

  /** Concentration/purity profile per column, EXACT-integer: how
    * skewed is the value distribution? Per column:
    *   n, n_distinct, top_freq (the mode's count), and the Gini-
    *   impurity rational  gini = (n² − Σc²)/n²  shipped un-divided as
    *   `gini_num` = n²−Σc², `gini_den` = n²
    * — 0 for a constant column, → (1 − 1/k) for k uniform values.
    * The label-balance / partition-key health check (a join or
    * groupBy key with gini ≈ 0 is a ONE-TASK shuffle; a near-constant
    * "language" column means the corpus isn't the mix you think), with
    * zero logs/floats so it hash-certifies — the entropy question
    * answered in Gini form (Breiman's CART impurity), which is
    * rational where Shannon entropy is not.
    *
    * Scale shape, per column: one value-counts hash aggregate (the
    * column-pruned scan) contracting to distinct values, then a 1-row
    * fold — Σc² of longs can overflow BIGINT only past n ≈ 3·10⁹ rows
    * in ONE value, so the fold runs in DECIMAL(38,0) and emits
    * BIGINTs (loud overflow, not silent wrap). k columns ⇒ k
    * independent jobs, like [[summarize]].
    */
  def purityProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.select(col(c).as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).cast("long").as("n"),
          count(lit(1)).as("n_distinct"),
          coalesce(max(col("__c")), lit(0L)).as("top_freq"),
          coalesce(sum(col("__c").cast("decimal(38,0)") * col("__c")),
            lit(0L).cast("decimal(38,0)")).as("__ss"))
        .select(lit(c).as("column"), col("n"), col("n_distinct"),
          col("top_freq"),
          (col("n").cast("decimal(38,0)") * col("n") - col("__ss"))
            .cast("bigint").as("gini_num"),
          (col("n").cast("decimal(38,0)") * col("n"))
            .cast("bigint").as("gini_den"))
    }.reduce(_.unionByName(_))
  }

  /** Inclusion-dependency discovery — the FOREIGN-KEY-candidate
    * profile (Casanova et al. 1988 INDs; the Bauckmann/SPIDER family
    * distributed): for each candidate pair "LHS column ⊆ RHS column",
    * how much of the LHS's distinct value set actually appears on the
    * RHS? `contained` pairs are referential-integrity candidates;
    * near-1 containment flags dirty FKs worth quarantining
    * ([[Validate]]'s referential leg, discovered instead of asserted).
    *
    * Exactness: all counts are exact distinct-set cardinalities; keys
    * compare via Spark's canonical STRING cast ([[summarize]]'s
    * contract — injective for the integer/date/string keys FKs are
    * made of, so containment is faithful; don't feed raw floats).
    *
    * Scale shape: every pair's two sides union into ONE (pair, key)
    * hash aggregate — map-side partial, high-cardinality keys,
    * skew-immune — then contract to a row per pair; no per-pair jobs,
    * no scalar crossJoins, and each side's scan prunes to the one
    * profiled column. Output per pair: `(pair, n_lhs, n_rhs,
    * n_missing, contained, containment_micro)` where n_missing counts
    * DISTINCT LHS values absent from the RHS and containment_micro =
    * (n_lhs − n_missing)·10⁶ div n_lhs (null LHS values are ignored:
    * SQL FKs don't constrain nulls).
    */
  def inclusionProfile(
      pairs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    val legs = pairs.map { case (label, ldf, lc, rdf, rc) =>
      val l = ldf.select(col(lc).cast("string").as("k"))
        .where(col("k").isNotNull)
        .select(lit(label).as("pair"), col("k"),
          lit(1).as("side_l"), lit(0).as("side_r"))
      val r = rdf.select(col(rc).cast("string").as("k"))
        .where(col("k").isNotNull)
        .select(lit(label).as("pair"), col("k"),
          lit(0).as("side_l"), lit(1).as("side_r"))
      l.union(r)
    }.reduce(_ union _)
    legs
      .groupBy(col("pair"), col("k"))
      .agg(max(col("side_l")).as("in_l"), max(col("side_r")).as("in_r"))
      .groupBy(col("pair"))
      .agg(
        sum(col("in_l")).as("n_lhs"),
        sum(col("in_r")).as("n_rhs"),
        sum(when(col("in_l") === 1 && col("in_r") === 0, 1L).otherwise(0L))
          .as("n_missing"))
      .withColumn("contained", col("n_missing") === 0)
      .withColumn("containment_micro",
        expr("(n_lhs - n_missing) * 1000000L div n_lhs"))
  }
}
