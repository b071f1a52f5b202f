package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curves (Kaplan & Meier, JASA 1958) — the
  * product-limit estimate of "what fraction survives past t" under
  * right censoring, the standard readout for churn/retention where
  * subjects still alive at the horizon must NOT count as deaths (a
  * naive retention curve treats them as churned and biases every
  * step down). Per distinct event time t with d deaths out of n at
  * risk: S(t) = Π_{t' ≤ t} (n_t' − d_t') / n_t'.
  *
  * Exactness: the survival product QUANTIZES per step to micro-units
  * via the integer recursion s ← s·(n−d) div n, s₀ = 10⁶ (the
  * pageRank floor convention: < 1 µunit loss per step, bit-identical
  * on any engine; the true rational's denominator grows without
  * bound, so clearing it is not an option). n_risk derives inside
  * the same fold: n ← n − d − c. Every output column is an exact
  * BIGINT the oracle replays with a recursive CTE.
  *
  * Scale shape: subjects contract to (group, DISTINCT duration) in
  * one map-side-partial hash aggregate; each group's curve then
  * folds INSIDE one row via sort_array + a codegen'd `aggregate`
  * lambda over the bounded step array — no window anywhere, no
  * per-group sort of subject rows. Contract: durations are DISCRETE
  * (integer days/weeks — [[Quantiles.valueThresholds]]' discreteness
  * rule); distinct times per group must fit one row's array
  * (thousands, not millions — bin finer-grained durations upstream).
  */
object Survival {

  /** Per-group Kaplan–Meier table. `durationCol` integer time to
    * event/censoring; `eventCol` 1 = event observed, 0 = censored.
    * Output per (group, t): `n_risk, d_events, c_censored, s_micro`
    * (survival AFTER t's deaths, micro-units), t ascending. Censored
    * subjects leave the risk set after t (the standard "deaths
    * before censorings at ties" convention).
    */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val t = col(durationCol).cast("long")
    val e = col(eventCol).cast("int")
    val per = df
      .where(t.isNotNull && (e === 0 || e === 1))
      .groupBy(col(groupCol), t.as("t"))
      .agg(sum(when(e === 1, 1L).otherwise(0L)).as("d"),
        sum(when(e === 0, 1L).otherwise(0L)).as("c"))
    val curves = per
      .groupBy(col(groupCol))
      .agg(sum(col("d") + col("c")).as("n_total"),
        sort_array(collect_list(struct(col("t"), col("d"), col("c"))))
          .as("steps"))
      // the fold: carry (n_risk, s_micro) and append one output struct
      // per step — integer arithmetic only, bounded array
      .withColumn("rows", expr(
        """aggregate(
             steps,
             struct(n_total AS n, CAST(1000000 AS BIGINT) AS s,
                    CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
                      d_events: BIGINT, c_censored: BIGINT,
                      s_micro: BIGINT>>) AS acc),
             (st, x) -> struct(
               st.n - x.d - x.c AS n,
               (st.s * (st.n - x.d)) div st.n AS s,
               array_append(st.acc, struct(x.t AS t, st.n AS n_risk,
                 x.d AS d_events, x.c AS c_censored,
                 (st.s * (st.n - x.d)) div st.n AS s_micro)) AS acc),
             st -> st.acc)"""))
    curves
      .select(col(groupCol), explode(col("rows")).as("r"))
      .select(col(groupCol), col("r.t").as("t"), col("r.n_risk"),
        col("r.d_events"), col("r.c_censored"), col("r.s_micro"))
  }
}
