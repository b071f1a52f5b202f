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

  /** Randomization test with EXACT integer p-value ingredients — the
    * finite-sample significance readout [[welch]] deliberately leaves
    * out (p-values via t CDFs need libm transcendentals, which are not
    * cross-engine reproducible; a randomization null needs only
    * arithmetic). The classic Fisher-style test (Fisher 1935; Edgington
    * randomization form): re-draw each unit's arm under the null `b`
    * times with the DETERMINISTIC md5 coin (the q47/q132 no-RNG
    * convention — task retries AND an independent engine replay the
    * same draws), recompute the mean difference, and count replicates
    * at least as extreme as observed. The mean difference stays a
    * RATIONAL — T = (S₁·n₀ − S₀·n₁) / (n₁·n₀) — and extremeness is the
    * cross-multiplied integer comparison |num_r|·den_obs ≥
    * |num_obs|·den_r in DECIMAL(38,0), so the whole test is
    * bit-exact: p = p_num/p_den with the add-one correction
    * p_num = #exceed + 1, p_den = b + 1 (Davison & Hinkley).
    *
    * Degenerate replicates (all units drawn into one arm — den_r = 0,
    * T undefined) count as exceedances: conservative, and vanishingly
    * rare for n ≫ 30.
    *
    * Scale shape: one row per (unit × replicate) EXISTS ONLY inside
    * the map stage (explode feeding a map-side partial aggregate) —
    * the shuffle carries b partial rows per partition, the reduce
    * contracts to b rows, then one 1-row fold against the broadcast
    * observed scalar (police-whitelisted 1-row crossJoin). Units are
    * never collected; b bounds every post-shuffle cardinality.
    *
    * `armCol` must be 0/1; `valueCol` fixed-point BIGINT (centi-units
    * keep the DECIMAL(38,0) cross-products exact far past any real
    * experiment size). Returns ONE row: n, n_treat, num_obs, den_obs,
    * n_exceed, n_reps, p_num, p_den.
    */
  def permutationTest(df: DataFrame, idCol: String, armCol: String,
                      valueCol: String, b: Int = 199,
                      salt: String = "42"): DataFrame = {
    require(b >= 1, "need at least one replicate")
    val base = df.select(col(idCol).cast("string").as("__id"),
      col(armCol).cast("int").as("__arm"), col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull && (col("__arm") === 0 || col("__arm") === 1))
    val obs = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n_treat"),
      coalesce(sum(col("__v")), lit(0L)).cast("long").as("s_tot"),
      coalesce(sum(when(col("__arm") === 1, col("__v"))), lit(0L))
        .cast("long").as("s_treat"))
    val coin = conv(substring(md5(concat_ws(":", lit("perm"), lit(salt),
      col("__id"), col("__r").cast("string"))), 1, 12), 16, 10)
      .cast("long") % 2
    val reps = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .select(col("__r"), col("__v"), (coin === 1).as("__t"))
      .groupBy(col("__r"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n1_r"),
        coalesce(sum(when(col("__t"), col("__v"))), lit(0L))
          .cast("long").as("s1_r"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val scored = reps.crossJoin(broadcast(obs))
      .withColumn("n0_r", col("n") - col("n1_r"))
      .withColumn("num_r",
        dec(col("s1_r")) * (col("n") - col("n1_r"))
          - dec(col("s_tot") - col("s1_r")) * col("n1_r"))
      .withColumn("den_r", dec(col("n1_r")) * (col("n") - col("n1_r")))
      .withColumn("num_obs",
        dec(col("s_treat")) * (col("n") - col("n_treat"))
          - dec(col("s_tot") - col("s_treat")) * col("n_treat"))
      .withColumn("den_obs", dec(col("n_treat")) * (col("n") - col("n_treat")))
      .withColumn("exceed",
        col("den_r") === 0 ||
          abs(col("num_r")) * col("den_obs") >= abs(col("num_obs")) * col("den_r"))
    scored.agg(
        min(col("n")).as("n"), min(col("n_treat")).as("n_treat"),
        min(col("num_obs")).cast("long").as("num_obs"),
        min(col("den_obs")).cast("long").as("den_obs"),
        sum(when(col("exceed"), 1L).otherwise(0L)).as("n_exceed"),
        count(lit(1)).as("n_reps"))
      .withColumn("p_num", col("n_exceed") + 1L)
      .withColumn("p_den", col("n_reps") + 1L)
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    * shrink an experiment metric's variance with a PRE-experiment
    * covariate X — adjusted metric Y' = Y − θ·(X − mean(X)) with
    * θ = cov(X,Y)/var(X) POOLED across arms (the covariate predates
    * assignment, so adjusting by it cannot bias the treatment effect,
    * only remove pre-existing user-level spread). The readout a mature
    * experimentation platform runs on every metric; variance shrinks
    * by the factor 1 − ρ²(X, Y).
    *
    * Exactness: the [[welch]] contract — fixed-point BIGINT inputs,
    * sufficient statistics (n, Σx, Σy exact longs; Σxy, Σx², Σy² in
    * DECIMAL(38,0) → double) off ONE map-side-partial hash aggregate,
    * then a FIXED IEEE expression shape for θ, the adjusted means, and
    * ρ² — cross-engine hash-certifiable under the same magnitude rule
    * (centi-units keep Σxy under 2^53).
    *
    * Output per group: n_a, n_b, theta, mean_y_a, mean_y_b, diff_raw,
    * adj_a, adj_b, diff_adj, rho2 — theta/adjustments null when
    * var(X) = 0 (constant covariate: nothing to remove; diff_adj
    * falls back to the caller reading diff_raw), rho2 additionally
    * null when var(Y) = 0.
    */
  def cuped(df: DataFrame, groupCol: String, armCol: String,
            yCol: String, xCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val y = col(yCol); val x = col(xCol)
    val isB = col(armCol) === 1
    val agg = df
      .where(y.isNotNull && x.isNotNull && (col(armCol) === 0 || isB))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(x), lit(0L)).cast("long").as("sx"),
        coalesce(sum(y), lit(0L)).cast("long").as("sy"),
        coalesce(sum(when(!isB, x)), lit(0L)).cast("long").as("sx_a"),
        coalesce(sum(when(isB, x)), lit(0L)).cast("long").as("sx_b"),
        coalesce(sum(when(!isB, y)), lit(0L)).cast("long").as("sy_a"),
        coalesce(sum(when(isB, y)), lit(0L)).cast("long").as("sy_b"),
        coalesce(sum(dec(x) * dec(y)), lit(0L)).cast("double").as("sxy"),
        coalesce(sum(dec(x) * dec(x)), lit(0L)).cast("double").as("sxx"),
        coalesce(sum(dec(y) * dec(y)), lit(0L)).cast("double").as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val covNum = nD * col("sxy") - sxD * syD
    val varXNum = nD * col("sxx") - sxD * sxD
    val varYNum = nD * col("syy") - syD * syD
    val theta = covNum / varXNum
    val meanX = sxD / nD
    val meanYA = col("sy_a").cast("double") / col("n_a").cast("double")
    val meanYB = col("sy_b").cast("double") / col("n_b").cast("double")
    val meanXA = col("sx_a").cast("double") / col("n_a").cast("double")
    val meanXB = col("sx_b").cast("double") / col("n_b").cast("double")
    val okX = col("n_a") >= 1 && col("n_b") >= 1 && varXNum > 0.0
    val adjA = meanYA - theta * (meanXA - meanX)
    val adjB = meanYB - theta * (meanXB - meanX)
    agg
      .withColumn("theta", when(okX, theta))
      .withColumn("mean_y_a", meanYA).withColumn("mean_y_b", meanYB)
      .withColumn("diff_raw", meanYB - meanYA)
      .withColumn("adj_a", when(okX, adjA))
      .withColumn("adj_b", when(okX, adjB))
      .withColumn("diff_adj", when(okX, adjB - adjA))
      .withColumn("rho2", when(okX && varYNum > 0.0,
        (covNum * covNum) / (varXNum * varYNum)))
      .drop("sxy", "sxx", "syy", "sx", "sy", "sx_a", "sx_b", "sy_a", "sy_b")
  }

  /** Mann–Whitney U / Wilcoxon rank-sum readout (Mann & Whitney 1947)
    * — the NONPARAMETRIC two-sample comparison: does arm B
    * stochastically dominate arm A? Complements [[welch]] (means) the
    * way [[Outliers]] complements plain aggregates: rank-based, so a
    * heavy tail or a few whales can't swamp the readout, and
    * U/(n_a·n_b) IS the probability a random B draw beats a random A
    * draw (the AUC of arm-vs-value — same statistic as
    * [[Classification]]'s aucExact, here as an experiment readout).
    *
    * Exactness: midranks carry a half, so every certified output is
    * the DOUBLED integer — r_b_x2 = 2·Σ(ranks of B), u_b_x2 = 2·U_B —
    * making ties exact with zero floats. Per distinct value v with
    * count c (c1 in arm B) the doubled midrank is 2·below + c + 1, so
    * r_b_x2 = Σ c1·(2·below + c + 1); u_b_x2 = r_b_x2 − n_b·(n_b+1);
    * u_a_x2 = 2·n_a·n_b − u_b_x2 (the U-duality doubles as a
    * self-check). `tie_term` = Σ(c³−c) is the variance correction's
    * exact ingredient; the z-score's sqrt is left to the caller (the
    * [[welch]] no-transcendentals rule). Sums ride DECIMAL(38,0) and
    * land as BIGINT — exact to ~2·10⁹ rows per group (2n² < 2⁶³).
    *
    * Plan shape: one hash aggregate contracts to (group, DISTINCT
    * value); the cumulative-below window rides THAT contraction
    * partitioned by group ([[Quantiles.percentileRankByGroup]]'s
    * contract — rows never enter a sort); one more hash aggregate
    * folds to a row per group. `armCol` must be 0/1; `valueCol`
    * integer fixed-point ([[Regression.microUnits]] upstream).
    * Output: `group, n_a, n_b, r_b_x2, u_b_x2, u_a_x2, tie_term,
    * auc_micro` with auc_micro = u_b_x2·10⁶ div (2·n_a·n_b), null
    * when either arm is empty.
    */
  def mannWhitney(df: DataFrame, groupCol: String, armCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val g = col(groupCol)
    val v = col(valueCol)
    val isB = col(armCol) === 1
    val perVal = df
      .where(v.isNotNull && (col(armCol) === 0 || isB))
      .groupBy(g, v.as("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(isB, 1L).otherwise(0L)).as("__c1"))
    // distinct-value contraction window (percentileRankByGroup's
    // shape): the sort runs over (group, distinct value) rows only
    val wBelow = Window.partitionBy(g).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal.withColumn("__below",
      coalesce(sum(col("__c")).over(wBelow), lit(0L)))
    ranked.groupBy(g)
      .agg(
        sum(col("__c") - col("__c1")).as("n_a"),
        sum(col("__c1")).as("n_b"),
        sum(dec(col("__c1")) * (lit(2L) * col("__below") + col("__c") + 1L))
          .cast("long").as("r_b_x2"),
        sum(dec(col("__c")) * col("__c") * col("__c") - col("__c"))
          .cast("long").as("tie_term"))
      .withColumn("u_b_x2",
        (dec(col("r_b_x2")) - dec(col("n_b")) * (col("n_b") + 1L))
          .cast("long"))
      .withColumn("u_a_x2",
        (dec(lit(2L)) * col("n_a") * col("n_b") - col("u_b_x2"))
          .cast("long"))
      .withColumn("auc_micro", when(col("n_a") > 0 && col("n_b") > 0,
        expr("CAST(CAST(u_b_x2 AS DECIMAL(38,0)) * 1000000 " +
          "div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test (Mantel & Haenszel
    * 1959) — the BINARY-outcome experiment readout that controls for
    * a confounding stratum (the Simpson's-paradox killer: pooled 2×2
    * tables lie when arm mix differs across strata; CMH compares each
    * stratum's table to its own hypergeometric expectation and folds).
    * Per stratum k with n rows, n1 in arm 1, m1 positive outcomes and
    * a = arm-1 positives: E[a] = n1·m1/n, Var[a] =
    * n1·n0·m1·m0/(n²(n−1)); the statistic is (Σa − ΣE)²/ΣVar.
    *
    * Exactness: each stratum's E and Var are rationals — they
    * QUANTIZE to exact micro-unit integers via `div` (the pageRank
    * floor convention: < 1 µunit loss per stratum, bit-identical on
    * any engine), so the folded sums are certifiable BIGINTs and the
    * final chi2 derives in one fixed IEEE shape from them. Magnitude
    * rule: n⁴·10⁶ must fit DECIMAL(38,0) — per-stratum n up to
    * ~3·10⁷ (strata are subgroups; shard larger ones upstream).
    *
    * One map-side-partial hash aggregate per stratum, one 1-row fold
    * — no window, no collect. Strata with n < 2 contribute their `a`
    * and E but zero variance (the degenerate-table convention).
    * Output one row: `k_strata, sum_a, sum_exp_micro, sum_var_micro,
    * num_micro, chi2` (chi2 null when ΣVar = 0).
    */
  def cmh(df: DataFrame, stratumCol: String, armCol: String,
          outcomeCol: String): DataFrame = {
    val isB = col(armCol) === 1
    val isPos = col(outcomeCol) === 1
    val per = df
      .where((col(armCol) === 0 || isB) &&
        (col(outcomeCol) === 0 || isPos))
      .groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(isB, 1L).otherwise(0L)).as("n1"),
        sum(when(isPos, 1L).otherwise(0L)).as("m1"),
        sum(when(isB && isPos, 1L).otherwise(0L)).as("a"))
      .withColumn("exp_micro", expr(
        "CAST((CAST(n1 AS DECIMAL(38,0)) * m1 * 1000000) " +
          "div CAST(n AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("var_micro", when(col("n") >= 2, expr(
        "CAST((CAST(n1 AS DECIMAL(38,0)) * (n - n1) * m1 * (n - m1) " +
          "* 1000000) div (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) " +
          "AS BIGINT)")).otherwise(lit(0L)))
    val folded = per.agg(
      count(lit(1)).as("k_strata"),
      sum(col("a")).as("sum_a"),
      sum(col("exp_micro")).as("sum_exp_micro"),
      sum(col("var_micro")).as("sum_var_micro"))
    folded
      .withColumn("num_micro", col("sum_a") * 1000000L - col("sum_exp_micro"))
      .withColumn("chi2", when(col("sum_var_micro") > 0,
        (col("num_micro").cast("double") * col("num_micro").cast("double"))
          / (lit(1000000.0) * col("sum_var_micro").cast("double"))))
  }

  /** [[permutationTest]] PER GROUP — one exact randomization p-value
    * for every metric group in a single plan (the multiple-testing
    * input [[bhAdjust]] consumes). Identical statistic and coin
    * construction, with the group riding both aggregation keys and
    * the md5 coin (a unit appearing in two groups draws independent
    * permutations). The observed-stats side joins back ON THE GROUP
    * KEY (group-cardinality broadcast), so the grouped form needs no
    * crossJoin at all. Output: one row per group with
    * [[permutationTest]]'s columns.
    */
  def permutationTestByGroup(df: DataFrame, groupCol: String, idCol: String,
                             armCol: String, valueCol: String, b: Int = 199,
                             salt: String = "42"): DataFrame = {
    require(b >= 1, "need at least one replicate")
    val base = df.select(col(groupCol).as("__g"),
      col(idCol).cast("string").as("__id"),
      col(armCol).cast("int").as("__arm"), col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull && (col("__arm") === 0 || col("__arm") === 1))
    val obs = base.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n_treat"),
      coalesce(sum(col("__v")), lit(0L)).cast("long").as("s_tot"),
      coalesce(sum(when(col("__arm") === 1, col("__v"))), lit(0L))
        .cast("long").as("s_treat"))
    val coin = conv(substring(md5(concat_ws(":", lit("perm"), lit(salt),
      col("__g").cast("string"), col("__id"), col("__r").cast("string"))),
      1, 12), 16, 10).cast("long") % 2
    val reps = base
      .select(col("__g"), col("__id"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .select(col("__g"), col("__r"), col("__v"), (coin === 1).as("__t"))
      .groupBy(col("__g"), col("__r"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n1_r"),
        coalesce(sum(when(col("__t"), col("__v"))), lit(0L))
          .cast("long").as("s1_r"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val scored = reps.join(broadcast(obs), Seq("__g"))
      .withColumn("num_r",
        dec(col("s1_r")) * (col("n") - col("n1_r"))
          - dec(col("s_tot") - col("s1_r")) * col("n1_r"))
      .withColumn("den_r", dec(col("n1_r")) * (col("n") - col("n1_r")))
      .withColumn("num_obs",
        dec(col("s_treat")) * (col("n") - col("n_treat"))
          - dec(col("s_tot") - col("s_treat")) * col("n_treat"))
      .withColumn("den_obs", dec(col("n_treat")) * (col("n") - col("n_treat")))
      .withColumn("exceed",
        col("den_r") === 0 ||
          abs(col("num_r")) * col("den_obs") >= abs(col("num_obs")) * col("den_r"))
    scored.groupBy(col("__g"))
      .agg(
        min(col("n")).as("n"), min(col("n_treat")).as("n_treat"),
        min(col("num_obs")).cast("long").as("num_obs"),
        min(col("den_obs")).cast("long").as("den_obs"),
        sum(when(col("exceed"), 1L).otherwise(0L)).as("n_exceed"),
        count(lit(1)).as("n_reps"))
      .withColumn("p_num", col("n_exceed") + 1L)
      .withColumn("p_den", col("n_reps") + 1L)
      .withColumnRenamed("__g", groupCol)
  }

  /** Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    * 1995) over a table of EXACT rational p-values — "we ran one test
    * per metric; which rejections survive multiple-testing control at
    * level α?" Sort the m p-values ascending, find the largest rank i
    * with p_(i) ≤ i·α/m, reject ranks 1..i. Every comparison is the
    * cross-multiplied integer p_num·m·αDen ≤ i·αNum·p_den — no float
    * p-values anywhere, so the decision set hash-certifies.
    *
    * CONTRACT: all tests must share ONE p_den (true by construction
    * for the randomization family — p_den = b+1) and carry NON-NULL
    * p_num/p_den; heterogeneous denominators would break the p_num
    * sort and null p-values would silently bypass the distinct count
    * (countDistinct ignores nulls) and null out the decision flags,
    * so the operator RAISES on both rather than misorder. Scale shape: the test table is a
    * tiny contraction (one row per metric group); it folds INSIDE one
    * row via sort_array + two codegen'd array lambdas ([[Survival
    * .kaplanMeier]]'s pattern — no window, no cartesian), then
    * re-explodes. Output per test: `key, p_num, p_den, rank, m,
    * rejected` (step-up: rejected iff SOME rank ≥ own satisfies the
    * threshold).
    */
  def bhAdjust(tests: DataFrame, keyCol: String, pNumCol: String,
               pDenCol: String, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"need 0 < alpha < 1, got $alphaNum/$alphaDen")
    val packed = tests
      .select(col(keyCol).cast("string").as("key"),
        col(pNumCol).cast("long").as("p_num"),
        col(pDenCol).cast("long").as("p_den"))
      .agg(count(lit(1)).as("m"),
        countDistinct(col("p_den")).as("__ndens"),
        sum(when(col("p_num").isNull || col("p_den").isNull, 1L)
          .otherwise(0L)).as("__nbad"),
        min(col("p_den")).as("__den"),
        sort_array(collect_list(struct(col("p_num"), col("key")))).as("ts"))
      // loud guards: mixed denominators would sort wrong, and NULL
      // p_num/p_den rows would slip past countDistinct (it ignores
      // nulls) and poison the flags — fail, never misorder or null out.
      // The guards gate `m` itself (m flows into every output row and
      // the threshold expr), so Catalyst cannot prune them away.
      .withColumn("m",
        when(col("__nbad") > 0,
          raise_error(lit("bhAdjust: tests carry null p_num/p_den " +
            "values — every test needs an exact rational p-value"))
            .cast("long"))
        .when(col("__ndens") <= 1, col("m"))
        .otherwise(
          raise_error(lit("bhAdjust: tests carry mixed p_den values — " +
            "rerun with a shared replicate count")).cast("long")))
    val out = packed
      // rank-indexed threshold flags (0-based i → rank i+1)
      .withColumn("flags", expr(
        s"""transform(ts, (t, i) ->
              struct(t.p_num AS p_num, t.key AS key, CAST(i + 1 AS BIGINT)
                AS rank,
                t.p_num * m * ${alphaDen}L <= (i + 1) * ${alphaNum}L * __den
                  AS ok))"""))
      // step-up: suffix-OR of ok, via a reverse fold
      .withColumn("rows", expr(
        """reverse(aggregate(
             reverse(flags),
             struct(false AS anyok,
               CAST(array() AS ARRAY<STRUCT<p_num: BIGINT, key: STRING,
                 rank: BIGINT, rejected: BOOLEAN>>) AS acc),
             (st, x) -> struct(st.anyok OR x.ok AS anyok,
               array_append(st.acc, struct(x.p_num AS p_num, x.key AS key,
                 x.rank AS rank, st.anyok OR x.ok AS rejected)) AS acc),
             st -> st.acc))"""))
    out.select(col("m"), col("__den").as("p_den"), explode(col("rows")).as("r"))
      .select(col("r.key").as("key"), col("r.p_num").as("p_num"),
        col("p_den"), col("r.rank").as("rank"), col("m"),
        col("r.rejected").as("rejected"))
  }
}
