package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational division (Codd 1972) — the "for ALL" quantifier the rest
  * of the relational surface lacks: given a pairs table (a, b) and a
  * divisor set of b values, return every `a` related to EVERY b in the
  * divisor ("suppliers who supply ALL the parts on this list",
  * "users who completed EVERY onboarding step", "hosts that emitted
  * every probe type"). SQL spells it as double-negated NOT EXISTS or a
  * count-matching HAVING; the engine ships it as one operator with the
  * count-matching plan, which is the scalable spelling (the
  * double-NOT-EXISTS form is two correlated anti-joins).
  *
  * Scale shape (100 TB): the divisor is semi-joined (broadcast — a
  * division divisor is a LIST, small by nature) onto the pairs scan,
  * so only pairs touching the divisor survive the scan; one distinct
  * contraction on (a, b) then one hash aggregate per `a`; the required
  * count arrives as a 1-row broadcast cross join (police-whitelisted
  * scalar — no driver action, the whole thing is one lazy plan).
  * Nothing shuffles the full pairs table beyond the semi-join's
  * filtered residue; no window.
  */
object Relational {

  /** All `aCol` values related to every distinct value of the
    * divisor's FIRST column. Pairs with b values outside the divisor
    * are ignored; duplicates on either side collapse. An EMPTY divisor
    * returns no rows (vacuous truth is almost never what a list-match
    * caller wants; SQL's HAVING spelling agrees — there is no group to
    * count). Returns `(aCol, n_required)` with n_required = |divisor|,
    * one row per qualifying a.
    */
  def divide(pairs: DataFrame, aCol: String, bCol: String,
             divisor: DataFrame): DataFrame = {
    val d = divisor.select(col(divisor.columns.head).as("__b")).distinct()
    val need = d.agg(count(lit(1)).as("n_required"))
    pairs.select(col(aCol), col(bCol).as("__b"))
      .join(broadcast(d), Seq("__b"), "left_semi")
      .distinct()
      .groupBy(col(aCol))
      .agg(count(lit(1)).as("__n_matched"))
      .crossJoin(broadcast(need))
      .filter(col("__n_matched") === col("n_required"))
      .select(col(aCol), col("n_required"))
  }
}
