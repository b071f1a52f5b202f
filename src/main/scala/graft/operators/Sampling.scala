package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement at scale — the selection step
  * after a scoring pass ([[Importance]]'s DSIR weights, an LM-quality
  * score, a recency weight): draw k documents per group with inclusion
  * probability ∝ weight, deterministically.
  *
  * Construction (Efraimidis & Spirakis 2006, A-ES): each row gets the
  * key u^(1/w) for u uniform in (0,1); the k LARGEST keys per group
  * are exactly a weight-proportional sample without replacement. Two
  * scale/determinism choices:
  *
  *  - u derives from md5(salt:id) — the [[graft.functions.Curation
  *    .splitAssign]] convention — so the sample is a pure function of
  *    (salt, id, weight): reruns, retries, cluster sizes and engines
  *    all agree, and re-drawing with a new salt is just a new salt.
  *  - the per-group top-k runs through [[graft.functions.GroupTopK]]'s
  *    bounded mergeable aggregate — no window, no sort, a skewed
  *    group costs what a balanced one does (q82's scale shape).
  *
  * ln u / w replaces u^(1/w) (same ordering, better conditioning near
  * u→1); weights must be > 0 — non-positive weights are excluded the
  * way SQL aggregates drop nulls.
  */
object Sampling {

  /** Deterministic uniform in (0,1] from the first 15 hex chars of
    * md5(salt:id): 60 uniform bits, ROUNDED into the double's 53-bit
    * mantissa (values within ~2^7 of 16^15 can round to u = 1.0
    * exactly — key 0, probability ~2^-53 per id; harmless, and the
    * spec's driver reference replicates the identical rounding). The
    * +1 shift keeps u > 0, so ln is always finite.
    */
  private def u01(idCol: String, salt: String) =
    (conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("double") + 1.0) /
      lit(math.pow(16.0, 15))

  /** k-per-group weighted sample without replacement: one row per
    * sampled id with its weight and selection key, best-first rank
    * within the group. Groups smaller than k return whole.
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
                     weightCol: String, k: Int,
                     salt: String = "wsample"): DataFrame = {
    import graft.functions.expressions.group_top_k
    val keyed = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__key", log(u01(idCol, salt)) / col(weightCol))
    keyed
      .groupBy(col(groupCol))
      .agg(group_top_k(col("__key"), col(idCol), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__i", "__t")))
      .select(col(groupCol), (col("__i") + 1).cast("long").as("sample_rank"),
        col("__t.id").as(idCol), col("__t.key").as("selection_key"))
  }
  /** Deterministic negative sampling for contrastive training: for
    * each anchor id, `k` pseudo-random corpus ids ≠ the anchor, drawn
    * by hash arithmetic — reproducible across runs and engines
    * (md5-hex → integer → mod N, the q47/q75 no-RNG convention), so
    * the drawn pairs hash-certify. Requires a DENSE 0..N−1 id column
    * (what [[Packing]]/corpus layout emit); N is a driver scalar.
    *
    * Per anchor, `k · oversample` candidate draws are generated
    * row-locally (explode of a small sequence), self-collisions
    * filtered, duplicates collapsed keeping the earliest draw, and
    * the first `k` surviving draws kept by draw order — a window on
    * the high-cardinality anchor key. Tiny corpora can yield fewer
    * than k negatives (documented, not padded).
    */
  def negativeSamples(docs: DataFrame, idCol: String, k: Int,
                      oversample: Int = 2, salt: String = "neg"): DataFrame = {
    require(k >= 1 && oversample >= 1, "k and oversample must be positive")
    val n = docs.count()
    val cand = docs
      .select(col(idCol).cast("long").as("anchor"))
      .withColumn("draw_i", explode(sequence(lit(0), lit(k * oversample - 1))))
      .withColumn("neg_id",
        conv(substring(md5(concat_ws(":", lit(salt), col("anchor"),
          col("draw_i")).cast("binary")), 1, 12), 16, 10)
          .cast("long") % lit(n))
      .filter(col("neg_id") =!= col("anchor"))
      .groupBy(col("anchor"), col("neg_id"))
      .agg(min(col("draw_i")).as("draw_i"))
    cand
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("anchor")).orderBy(col("draw_i"))))
      .filter(col("rn") <= k)
      .select(col("anchor"), col("neg_id"), col("draw_i"))
  }
}
