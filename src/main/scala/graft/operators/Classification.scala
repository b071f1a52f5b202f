package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-quality readouts in EXACT integer arithmetic — the eval
  * step after a curation model scores a corpus ([[graft.functions
  * .Curation.classifierMargin]], [[NgramLM]] perplexity, quality
  * heuristics): did the score actually separate the classes, and do
  * two labelers agree beyond chance? Reference analogue: none (the
  * loader has no model eval); this extends the eval family beside
  * [[RetrievalEval]] (IR metrics) and [[ABTest]] (two-sample tests).
  *
  * Everything here returns integer sufficient statistics, not floats:
  * AUC and kappa are ratios of exact pair/agreement counts, so
  * emitting the counts makes the whole computation hash-certifiable
  * engine-to-engine (the q69/q70/q71 exact-bracket convention) and
  * lets callers divide once at presentation time.
  */
object Classification {

  /** Exact ROC AUC as the Mann-Whitney U statistic over all
    * (positive, negative) pairs, ties counted half. One row:
    * `n_pos`, `n_neg`, `u2` = 2·U = Σ_pairs [2·1(s⁺>s⁻) + 1(s⁺=s⁻)]
    * — all BIGINT, AUC = u2 / (2·n_pos·n_neg).
    *
    * Scale shape: one hash aggregate contracts the corpus to its
    * DISTINCT score values; the cumulative-negative window then rides
    * that contracted table ([[Quantiles]]' value-distinct cumsum
    * contract — fine for the discrete/integer-cleared scores this
    * repo's scorers emit, NOT for a continuous double score whose
    * distinct count ~ n; integer-clear such scores first, as q51/q74
    * do). The pair count itself is never materialized — u2 folds it
    * per distinct value: np_v · (2·cumNegBelow_v + nn_v).
    */
  def aucExact(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val pos = col(labelCol).cast("boolean")
    val counts = df
      .select(col(scoreCol).as("v"), pos.as("y"))
      .groupBy(col("v"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("np"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).cast("long").as("n_pos"),
        sum(col("nn")).cast("long").as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum_nn") + col("nn")))
          .cast("long").as("u2"))
  }

  /** Cohen's kappa sufficient statistics for two categorical labelers
    * over the same rows. One row of BIGINTs: `n`, `n_agree`, and
    * `pe_num` = Σ_k rowMarginal_k · colMarginal_k, so
    * κ = (n·n_agree − pe_num) / (n² − pe_num) exactly — the usual
    * p_o/p_e form with the n² cleared.
    *
    * Two tiny marginal aggregates joined on the category value (a
    * category one labeler never emits contributes 0 to chance
    * agreement, which the inner join encodes) — nothing rides a
    * window, skew-safe at any label distribution.
    */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val totals = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
    val rowM = base.groupBy(col("a").as("k")).agg(count(lit(1)).as("ra"))
    val colM = base.groupBy(col("b").as("k")).agg(count(lit(1)).as("cb"))
    val pe = rowM.join(colM, Seq("k"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("pe_num"))
    totals.crossJoin(pe)
      .select(col("n").cast("long").as("n"),
        col("n_agree").cast("long").as("n_agree"),
        col("pe_num").cast("long").as("pe_num"))
  }

  /** Fleiss' κ — chance-corrected agreement for n raters × k
    * categories (Fleiss 1971), the multi-rater generalization of
    * [[kappa]] that labeling pipelines need once more than two
    * models/annotators vote per item. Input is the long form: one row
    * per (item, assigned category) rating, EXACTLY n ratings per item
    * (guarded loud — mixed rater counts are a data bug, not a
    * convention).
    *
    * Exact integer sufficient statistics with denominators cleared
    * (let N = items, n = raters, n_ij the per-(item, category) vote
    * counts, A = Σ n_ij², c_j = Σ_i n_ij, S = Σ c_j²):
    *
    *   κ = [N·n·(A − N·n) − S·(n−1)] / [(n−1)·((N·n)² − S)]
    *
    * — BIGINT-exact numerator and denominator plus the single IEEE
    * quotient, the [[kappa]]/[[aucExact]] convention. (N·n)² bounds
    * the magnitudes: exact up to ~3·10⁹ total ratings, loudly
    * guarded — sample beyond, agreement needs no more.
    *
    * Scale shape: one hash aggregate on (item, category), one on
    * item (the guard + N), one on category (the margins) — all
    * map-side-partial, nothing rides a window; the scalars compose
    * via 1-row cross joins.
    */
  def fleissKappa(ratings: DataFrame, itemCol: String,
                  catCol: String): DataFrame = {
    val nij = ratings
      .groupBy(col(itemCol).as("i"), col(catCol).as("j"))
      .agg(count(lit(1)).as("m"))
    val perItem = nij.groupBy(col("i")).agg(sum(col("m")).as("n_r"))
    val itemStats = perItem.agg(
      count(lit(1)).as("n_items"),
      min(col("n_r")).as("__n_min"), max(col("n_r")).as("__n_max"))
    val aRow = nij.agg(sum(col("m") * col("m")).as("a_sum"))
    val catRow = nij.groupBy(col("j")).agg(sum(col("m")).as("c"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("c") * col("c")).as("s_sum"))
    itemStats.crossJoin(aRow).crossJoin(catRow)
      .withColumn("__guard",
        when(col("__n_min") =!= col("__n_max"),
          raise_error(concat(lit("fleissKappa: rater count varies across items: "),
            col("__n_min").cast("string"), lit(" vs "),
            col("__n_max").cast("string"))).cast("long"))
        .when(col("n_items") * col("__n_max") > lit(3000000000L),
          raise_error(lit("fleissKappa: > 3e9 ratings overflows the cleared integers; sample first")).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("n_raters", col("__n_max"))
      .withColumn("nn", (col("n_items") * col("n_raters")).cast("long"))
      .withColumn("kappa_num",
        (col("nn") * (col("a_sum") - col("nn")) -
          col("s_sum") * (col("n_raters") - 1) + col("__guard")).cast("long"))
      .withColumn("kappa_den",
        ((col("n_raters") - 1) * (col("nn") * col("nn") - col("s_sum")))
          .cast("long"))
      .withColumn("kappa",
        when(col("kappa_den") === 0, lit(null).cast("double"))
          .otherwise(col("kappa_num").cast("double") / col("kappa_den").cast("double")))
      .select(col("n_items").cast("long").as("n_items"),
        col("n_raters").cast("long").as("n_raters"),
        col("n_categories").cast("long").as("n_categories"),
        col("a_sum").cast("long").as("a_sum"),
        col("s_sum").cast("long").as("s_sum"),
        col("kappa_num"), col("kappa_den"), col("kappa"))
  }

  /** χ² term-label association — the feature-selection step for a
    * quality/domain classifier (which tokens predict the label?):
    * per distinct token, the 2×2 presence contingency (a = docs with
    * token ∧ label, b = label ∖ token, c = token ∖ label, d =
    * neither) and the χ² statistic in exact micro-units,
    *   chi2_micro = (10⁶·n·(ad−bc)²) div ((a+b)(c+d)(a+c)(b+d)),
    * computed in DECIMAL(38,0) so the (ad−bc)² cross term never
    * overflows a BIGINT (exact up to corpora of ~10⁶ docs; pre-sample
    * beyond — χ² needs no more). The quotient is ≤ 10⁶·n, back in
    * BIGINT range, and engine-exact: DuckDB replays it in HUGEINT.
    *
    * Token presence is per-doc DISTINCT (the standard 2×2), so the
    * explode carries each (doc, token) once; everything after is hash
    * aggregates on the token key. Tokens present in every document
    * are dropped (degenerate margin, zero information); degenerate
    * LABEL margins yield chi2_micro = 0 rather than a divide error.
    */
  def chi2Terms(docs: DataFrame, textCol: String, labelCol: String,
                minDocCount: Long = 2L): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val totals = docs.agg(count(lit(1)).as("n"),
      sum(when(y, 1L).otherwise(0L)).as("n_pos"))
    val tok = docs
      .select(y.as("y"),
        explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("token"))
    val counts = tok.groupBy(col("token"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("n_doc"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    counts.crossJoin(totals)
      .filter(col("n_doc") >= minDocCount && col("n_doc") < col("n"))
      .withColumn("b", col("n_pos") - col("a"))
      .withColumn("c", col("n_doc") - col("a"))
      .withColumn("d", col("n") - col("n_pos") - col("c"))
      .withColumn("__den",
        dec(col("a") + col("b")) * dec(col("c") + col("d")) *
          dec(col("a") + col("c")) * dec(col("b") + col("d")))
      .withColumn("__num",
        dec(lit(1000000L)) * dec(col("n")) *
          (dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))) *
          (dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))))
      .select(col("token"), col("a").cast("long").as("n_both"),
        col("b").cast("long").as("n_label_only"),
        col("c").cast("long").as("n_token_only"),
        col("d").cast("long").as("n_neither"),
        when(col("__den") > 0, expr("__num div __den")).otherwise(lit(0L))
          .cast("long").as("chi2_micro"))
  }

  /** Decile gains / lift table — the campaign-targeting readout
    * ("mail the top 2 deciles") that complements [[aucExact]]'s
    * single number with WHERE the separation lives: bucket rows into
    * score quantiles ([[Quantiles.bucketAssign]]'s threshold
    * machinery), then accumulate positives from the TOP bucket down.
    * Per bucket (descending score): n, n_pos, cum_n, cum_pos,
    * `gain_micro` = cum_pos·10⁶ div total_pos (share of all positives
    * captured so far) and `lift_micro` = cum_pos·n_total·10⁶ div
    * (total_pos·cum_n) (how many× better than random targeting); a
    * perfect model's first buckets approach lift = buckets·10⁶.
    *
    * Exactness: bucket cuts are exact quantile thresholds; every
    * output is integer `div` arithmetic off one per-bucket hash
    * aggregate — hash-certifiable. Scale shape: threshold set is
    * B−1 broadcast rows ([[Quantiles.valueThresholds]]' guarded
    * global window + k-range cross, the q62 police class); the
    * cumulative fold rides the B-row bucket contraction. Scores must
    * be integer fixed-point; labels 0/1.
    */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
                 buckets: Int = 10): DataFrame = {
    val lab = col(labelCol).cast("int")
    val base = df.where(col(scoreCol).isNotNull && (lab === 0 || lab === 1))
    val perBucket = Quantiles.bucketAssign(base, scoreCol, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(lab === 1, 1L).otherwise(0L)).as("n_pos"))
    // B-row contraction: the cumulative-from-the-top window is bounded
    // by the bucket count, never data rows
    val wTop = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    perBucket
      .withColumn("cum_n", sum(col("n")).over(wTop))
      .withColumn("cum_pos", sum(col("n_pos")).over(wTop))
      .withColumn("__nt", sum(col("n")).over(wAll))
      .withColumn("__pt", sum(col("n_pos")).over(wAll))
      .withColumn("gain_micro",
        when(col("__pt") > 0, expr("cum_pos * 1000000L div __pt")))
      .withColumn("lift_micro",
        when(col("__pt") > 0, expr(
          "CAST(CAST(cum_pos AS DECIMAL(38,0)) * __nt * 1000000 " +
            "div (CAST(__pt AS DECIMAL(38,0)) * cum_n) AS BIGINT)")))
      .drop("__nt", "__pt")
  }
}
