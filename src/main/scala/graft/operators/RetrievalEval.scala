package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the measurement leg of the retrieval family
  * ([[Bm25]], [[Bm25Index]], [[Similarity]], [[IvfIndex]]): given a
  * per-query candidate ranking and a relevance set, compute the
  * standard ranking metrics (hits@k, MRR, precision@k, recall@k).
  *
  * Scale shape: ranking never sorts — the per-query top-k runs through
  * [[graft.functions.GroupTopK]]'s bounded mergeable aggregate
  * (≤ k entries per map-side partial, skew-immune, q82's machinery),
  * and everything downstream operates on the k·|queries|-row
  * contraction. Metric arithmetic is integer counting plus single
  * IEEE divisions of small integers (1/rank, hits/k), so results
  * hash-certify across engines.
  */
object RetrievalEval {

  /** Exact per-query top-k ranking under (score DESC, id ASC) — the
    * deterministic dense ranking `row_number() OVER (ORDER BY score
    * DESC, id)` would give, WITHOUT the window: GroupTopK keeps the
    * leaders in bounded mergeable state. `scoreCol` is cast to double
    * for the aggregate's key — exact for integer scores below 2^53
    * (callers using integer-cleared rational scores stay certifiable).
    */
  def topKRanked(scored: DataFrame, queryCol: String, idCol: String,
                 scoreCol: String, k: Int): DataFrame = {
    import graft.functions.expressions.group_top_k
    scored
      .groupBy(col(queryCol))
      .agg(group_top_k(col(scoreCol).cast("double"), col(idCol), k).as("__top"))
      .select(col(queryCol), posexplode(col("__top")).as(Seq("__i", "__t")))
      .select(col(queryCol), col("__t.id").as(idCol),
        (col("__i") + 1).cast("long").as("rank"))
  }

  /** Per-query metrics of a ranking against a relevance set:
    * `n_relevant`, `hits_at_k` (relevant docs inside the top k),
    * `first_rel_rank` (null when no relevant doc ranked), `mrr`
    * (1/first_rel_rank, 0.0 when unranked), `precision_at_k`
    * (hits/k) and `recall_at_k` (hits/n_relevant, 0.0 on an empty
    * relevance set). Queries present in `ranked` but absent from
    * `relevance` score zero everywhere; relevance rows are
    * de-duplicated. The join key is (query, id) over k·|queries|
    * rows — the corpus never appears here.
    */
  def metricsAtK(ranked: DataFrame, relevance: DataFrame,
                 queryCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rel = relevance.select(col(queryCol), col(idCol)).distinct()
    val perQ = ranked
      .filter(col("rank") <= k) // metrics@k never see deeper ranks, whatever the caller ranked
      .join(rel.withColumn("__rel", lit(1L)), Seq(queryCol, idCol), "left")
      .groupBy(col(queryCol))
      .agg(
        sum(coalesce(col("__rel"), lit(0L))).as("hits_at_k"),
        min(when(col("__rel") === 1L, col("rank"))).as("first_rel_rank"))
    val nRel = rel.groupBy(col(queryCol)).agg(count(lit(1)).as("n_relevant"))
    perQ.join(nRel, Seq(queryCol), "left")
      .withColumn("n_relevant", coalesce(col("n_relevant"), lit(0L)))
      .withColumn("mrr",
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank")).otherwise(lit(0.0)))
      .withColumn("precision_at_k",
        col("hits_at_k").cast("double") / lit(k.toDouble))
      .withColumn("recall_at_k",
        when(col("n_relevant") > 0,
          col("hits_at_k").cast("double") / col("n_relevant")).otherwise(lit(0.0)))
      .select(col(queryCol), col("n_relevant"), col("hits_at_k"),
        col("first_rel_rank"), col("mrr"), col("precision_at_k"),
        col("recall_at_k"))
  }
}
