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
}
