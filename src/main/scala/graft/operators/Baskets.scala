package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the classic co-occurrence →
  * rule pipeline (Agrawal-Srikant a-priori, restricted to the pair
  * level that dominates practice) over any (basket, item) relation:
  * orders×parts, sessions×pages, documents×entities. Reference
  * analogue: none (the loader stops at COPY); this is engine-side
  * analytics over the landed tables, a sibling of [[Collocations]]
  * (which mines ADJACENT token pairs by PMI — here items co-occur
  * anywhere in an unordered basket and the readout is
  * support/confidence/lift).
  *
  * All outputs are exact integer counts — support, confidence and
  * lift are ratios of them (conf = n_pair/n_ante,
  * lift = n_pair·n_baskets/(n_ante·n_cons)), left un-divided so the
  * whole mining run hash-certifies and callers rank however they
  * like without float drift.
  */
object Baskets {

  /** Association rules at the pair level: one row per ORDERED pair
    * (antecedent → consequent), both directions of every co-occurring
    * unordered pair that clears `minPairCount`. Columns: `ante`,
    * `cons`, `n_pair`, `n_ante`, `n_cons`, `n_baskets` (all BIGINT).
    *
    * Scale shape: one distinct projection (basket,item), a per-basket
    * self-join for pairs (bounded by basket size² — cap pathological
    * baskets upstream; a retail order or browse session is tens of
    * items), and hash aggregates on the pair / item keys. The
    * `minPairCount` filter lands BEFORE the rule expansion and the
    * item-count joins, so the frequent-pair contraction — not the raw
    * pair volume — sizes everything downstream. Nothing broadcasts
    * the corpus; item counts join on the item key.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long = 2L): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val nBaskets = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.select(col("b"), col("i").as("x"))
      .join(bi.select(col("b"), col("i").as("y")), Seq("b"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val rules = pairs.select(col("x").as("ante"), col("y").as("cons"), col("n_pair"))
      .union(pairs.select(col("y").as("ante"), col("x").as("cons"), col("n_pair")))
    rules
      .join(itemCounts.select(col("i").as("ante"), col("n_i").as("n_ante")), Seq("ante"))
      .join(itemCounts.select(col("i").as("cons"), col("n_i").as("n_cons")), Seq("cons"))
      .crossJoin(nBaskets)
      .select(col("ante"), col("cons"), col("n_pair").cast("long").as("n_pair"),
        col("n_ante").cast("long").as("n_ante"),
        col("n_cons").cast("long").as("n_cons"),
        col("n_baskets").cast("long").as("n_baskets"))
  }

  /** Item-item collaborative filtering: each item's top-k most similar
    * neighbors by co-occurrence cosine, sim(i,j) = n_ij/√(n_i·n_j) —
    * the "customers also bought" readout. The RANKING score is the
    * exact integer `score_micro12 = (n_ij²·10¹²) div (n_i·n_j)` (the
    * squared cosine cleared — monotone in sim since all counts are
    * positive, so the order is THE cosine order, hash-certifiable with
    * no square root). Cross terms ride DECIMAL(38,0) (n_ij²·10¹²
    * passes 2^63 early); the quotient ≤ 10¹² returns to BIGINT and is
    * exact in the aggregate's double key.
    *
    * Per-item ranking is the bounded mergeable
    * [[graft.functions.GroupTopK]] aggregate under the total order
    * (score desc, neighbor asc) — never `row_number` over a
    * partitioned window (an everything-co-occurs-with-it staple item
    * would drag its whole neighbor list through one task's sort).
    * Item ids must be integral (the aggregate's id slot); hash or
    * dictionary-encode string SKUs first.
    */
  def itemSimilarityTopK(df: DataFrame, basketCol: String, itemCol: String,
                         k: Int, minPairCount: Long = 2L): DataFrame = {
    import graft.functions.expressions.group_top_k
    val scored = pairRules(df, basketCol, itemCol, minPairCount)
      .withColumn("score_micro12",
        expr("""CAST(CAST(n_pair AS DECIMAL(38,0)) * n_pair * 1000000000000
                 div (CAST(n_ante AS DECIMAL(38,0)) * n_cons) AS BIGINT)"""))
    scored
      .groupBy(col("ante").as("item"))
      .agg(group_top_k(col("score_micro12").cast("double"),
        col("cons").cast("long"), k).as("top"))
      .select(col("item"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("item"), (col("i") + 1).cast("long").as("rank"),
        col("t.id").as("neighbor"), col("t.key").cast("long").as("score_micro12"))
  }
}
