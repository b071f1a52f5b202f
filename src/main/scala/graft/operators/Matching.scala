package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Caliper nearest-neighbor matching (Rosenbaum & Rubin 1985; the
  * Cochran & Rubin caliper rule) — the observational-study /
  * quasi-experiment step: each treated unit is paired with its closest
  * control on an integer covariate (a propensity score in fixed-point
  * units, a spend total, an activity count), provided the gap is
  * within the caliper. Matching is WITH replacement (a control may
  * serve several treated units) and 1:1 per treated unit; treated
  * units with no control inside the caliper drop out — both standard
  * options of the method.
  *
  * Scale design (100 TB): never the all-pairs |xₜ−x_c| join. Both
  * sides bucket by `floor(x / caliper)`; any control within the
  * caliper of a treated unit lives in the treated unit's bucket or an
  * adjacent one, so treated rows fan out 3× to (b−1, b, b+1) and the
  * candidate join is a plain equi-join on the bucket key (the
  * [[RangeJoin]] blocking discipline). The per-treated argmin is
  * `min_by` over the TOTAL order (diff, control_id) — a mergeable hash
  * aggregate, no window partitioned on anything, so a mega-popular
  * covariate value costs what a balanced one does.
  *
  * Exactness: covariates are integral (centi-scale floats first —
  * [[Regression.centiUnits]]); diff and the tie-break are integers, so
  * the matched pairing is unique and hash-certifiable.
  */
object Matching {

  /** Match each row of `treated` to its nearest `control` row by the
    * integer covariate `xCol`, keeping pairs with `|Δ| ≤ caliper`.
    * Ties (equal distance) resolve to the smaller control id. Returns
    * one row per matched treated unit:
    * `(t_id, t_x, c_id, c_x, diff)`, ordered by nothing — callers
    * sort. Null ids/covariates are excluded on both sides.
    */
  def nearestWithin(treated: DataFrame, control: DataFrame,
                    idCol: String, xCol: String, caliper: Long): DataFrame = {
    require(caliper >= 1, "caliper must be >= 1")
    val t = treated.select(col(idCol).cast("long").as("t_id"),
        col(xCol).cast("long").as("t_x"))
      .filter(col("t_id").isNotNull && col("t_x").isNotNull)
    val c = control.select(col(idCol).cast("long").as("c_id"),
        col(xCol).cast("long").as("c_x"))
      .filter(col("c_id").isNotNull && col("c_x").isNotNull)
    // exact integer FLOOR division (x − pmod(x, c) is a multiple of c,
    // so the truncating div equals floor even for negatives) — float
    // floor could misbucket a boundary value by one ulp
    def fdiv(x: String): org.apache.spark.sql.Column =
      expr(s"($x - pmod($x, ${caliper}L)) div ${caliper}L")
    val cb = c.withColumn("b", fdiv("c_x"))
    val tb = t
      .withColumn("b0", fdiv("t_x"))
      .withColumn("b", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    tb.join(cb, "b")
      .withColumn("diff", abs(col("t_x") - col("c_x")))
      .filter(col("diff") <= caliper)
      .groupBy(col("t_id"), col("t_x"))
      .agg(min_by(struct(col("c_id"), col("c_x"), col("diff")),
        struct(col("diff"), col("c_id"))).as("m"))
      .select(col("t_id"), col("t_x"), col("m.c_id").as("c_id"),
        col("m.c_x").as("c_x"), col("m.diff").as("diff"))
  }

  /** One field comparison for [[fellegiSunter]]: the boolean agreement
    * column plus the integer MILLI log-likelihood-ratio weights the
    * caller derived from the field's m/u probabilities
    * (agree ≈ 1000·log₂(m/u) > 0, disagree ≈ 1000·log₂((1−m)/(1−u))
    * < 0). Integer weights keep the whole score engine-exact; deriving
    * them from m/u is a driver-side constant fold, not data work.
    */
  final case class FsField(agreeCol: org.apache.spark.sql.Column,
                           agreeWeightMilli: Long,
                           disagreeWeightMilli: Long)

  /** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969 —
    * the probabilistic model behind every serious ER system): each
    * candidate pair's match score is the SUM of per-field
    * log-likelihood-ratio weights, agreement earning the positive
    * m/u weight and disagreement the negative one; pairs at or above
    * `upperMilli` link, below `lowerMilli` reject, between the two
    * land in the clerical-review band. The rule-based golden-record
    * path ([[graft.operators.Clusters]] survivorship) consumes the
    * `link` pairs; the review band is the human queue.
    *
    * Input is a CANDIDATE PAIR frame (from any blocking scheme —
    * [[nearestWithin]]'s buckets, [[graft.operators.Dedup]] keys,
    * [[graft.operators.EditJoin]]): this operator never generates
    * pairs, so its cost is one codegen'd projection over the
    * candidates — no shuffle, no window, nothing global. Scores are
    * exact integer milli-units; the decision is a total function of
    * the agreement vector, so the whole classification
    * hash-certifies.
    */
  def fellegiSunter(pairs: DataFrame, idACol: String, idBCol: String,
                    fields: Seq[FsField], lowerMilli: Long,
                    upperMilli: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one field comparison")
    require(lowerMilli <= upperMilli, "need lowerMilli <= upperMilli")
    val score = fields.map { f =>
      when(f.agreeCol, lit(f.agreeWeightMilli))
        .otherwise(lit(f.disagreeWeightMilli))
    }.reduce(_ + _)
    val nAgree = fields.map(f => when(f.agreeCol, 1L).otherwise(0L))
      .reduce(_ + _)
    pairs
      .withColumn("score_milli", score.cast("long"))
      .withColumn("n_agree", nAgree.cast("long"))
      .withColumn("decision",
        when(col("score_milli") >= upperMilli, lit("link"))
          .when(col("score_milli") < lowerMilli, lit("reject"))
          .otherwise(lit("review")))
      .select(col(idACol), col(idBCol), col("n_agree"),
        col("score_milli"), col("decision"))
  }
}
