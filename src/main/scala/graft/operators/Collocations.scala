package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation extraction — adjacent-token pairs ranked by pointwise
  * mutual information (Church & Hanks 1990), the classic corpus
  * analytic for multi-word expressions ("New York", "machine
  * learning") run over a landed document corpus. Reference analogue:
  * none (engine-side analytics).
  *
  * Exactness: the rank key is the INTEGER-CLEARED PMI skeleton
  * `(n_pair · N · 10⁶) div (n_w1 · n_w2)` — PMI is log of that ratio
  * and log is monotone, so ranking by the cleared rational IS ranking
  * by PMI, with every compared value an exact BIGINT (the q87/q103
  * convention: certify the integer skeleton, leave the float form to
  * a spec). Magnitude bound: `n_pair ≤ N` and the product
  * `n_pair·N·10⁶` must fit a signed 64-bit — fine to ~3·10⁶ corpus
  * tokens per run; beyond that, pre-aggregate per shard or widen to
  * decimal (documented, not defaulted).
  *
  * Scale design (100 TB): tokens explode at the scan into adjacent
  * pairs; unigram and pair counts are map-side-partial hash
  * aggregates on the token/pair keys (high-cardinality, skew-immune);
  * the corpus token total is a 1-row broadcast; the global top-k is
  * TakeOrderedAndProject (per-partition top-k, merged once — never a
  * global sort).
  */
object Collocations {

  /** Whitespace tokens of `c` — [[graft.functions.TextFunctions.tokens]]'
    * convention, shared so the oracle's string replay matches.
    */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Top-`k` adjacent-token collocations with `n_pair >= minPair`
    * support, ranked by the cleared PMI skeleton under the total
    * order (pmi_scaled desc, w1 asc, w2 asc). Output:
    * `(w1, w2, n_pair, n_w1, n_w2, pmi_scaled)`, all exact integers
    * beside the token strings.
    */
  def pmiTopK(docs: DataFrame, textCol: String,
              k: Int, minPair: Long = 5L): DataFrame = {
    val toksCol = toks(col(textCol)).as("t")
    val uni = docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val pairs = docs.select(toksCol)
      .where(size(col("t")) >= 2) // < 2 tokens yields no pairs
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    val total = docs.select(size(toks(col(textCol))).as("n"))
      .agg(sum(col("n")).cast("long").as("n_tokens"))
    pairs
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi_scaled",
        expr("CAST((n_pair * n_tokens * 1000000) div (n_w1 * n_w2) AS BIGINT)"))
      .select(col("w1"), col("w2"), col("n_pair"),
        col("n_w1"), col("n_w2"), col("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * rank words by [[Graphs.pageRank]] over the adjacent-token
    * co-occurrence graph — a word matters when it co-occurs with
    * words that matter, which beats raw frequency for keywording
    * (stopword-adjacent hubs dilute, topic terms reinforce). The
    * corpus-level counterpart of [[pmiTopK]]: PMI finds PAIRS,
    * TextRank finds the central WORDS.
    *
    * Construction: directional adjacent pairs with support ≥
    * `minPair` (noise floor — rare typo bigrams would add millions of
    * degree-1 nodes), self-pairs dropped, then symmetrized (both
    * directions; TextRank's graph is undirected) and deduplicated
    * inside pageRank. A fixed `iters` of the exact integer recurrence
    * makes the whole ranking hash-certifiable (the q114 convention —
    * the oracle unrolls rounds over the same pair CTE).
    *
    * Scale shape: pair counting is [[pmiTopK]]'s map-side-partial
    * hash aggregate; the graph that iterates is the CONTRACTED
    * frequent-pair vocabulary graph (≪ corpus; bounded by vocab²/
    * support), and the final top-k is TakeOrderedAndProject. Output:
    * `(word, rank_micro)`, ties broken by word.
    */
  def textRankKeywords(docs: DataFrame, textCol: String, iters: Int = 3,
                       minPair: Long = 5L, k: Int = 30): DataFrame = {
    val pairs = docs.select(toks(col(textCol)).as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .where(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .union(pairs.select(col("w2").as("src"), col("w1").as("dst")))
    Graphs.pageRank(edges, "src", "dst", iters)
      .select(col("node").as("word"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("word"))
      .limit(k)
  }
}
