package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring over a document corpus — the lexical leg of
  * a RAG / retrieval pipeline beside the ANN family ([[Similarity]],
  * [[IvfIndex]], [[PqIndex]]). Robertson–Spärck Jones BM25 with the
  * standard k1/b parameterization. Reference analogue: none
  * (driver-brief operator family).
  *
  * Scale design (the 100 TB shape):
  *
  *  - the QUERY term set is a literal array in the plan — the
  *    tf filter (`array_contains`) runs AT THE SCAN, so the exploded
  *    token stream contracts to query-term hits before anything
  *    shuffles. Per-doc tf is one groupBy on (doc_id, term).
  *  - document lengths are a scan-level `size(split(...))` — no
  *    second tokenization pass, no shuffle beyond the tf groupBy.
  *  - corpus scalars (N docs, Σ dl) are a 1-row aggregate
  *    cross-joined back — a broadcast of two longs.
  *  - df per query term comes from the tf table itself
  *    (`countDistinct(doc_id)`) — query-terms-sized, tiny.
  *
  * Correctness strategy (q73): with k1 = 1.2, b = 0.75 the
  * length-normalized tf component clears denominators to a ratio of
  * two EXACT integers:
  *
  *   tfNorm = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/S)
  *          = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)
  *
  * (multiply through by 10·S; S = Σ dl, N = corpus size). Both sides
  * fit a BIGINT at test scale, so `tf_norm` is ONE IEEE division of
  * two exact integers — hash-certifiable in DuckDB alongside the raw
  * tf/df/dl integers. The log idf and the final summed score are
  * transcendental → engine-side, spec'd against a driver reference.
  * (At corpus scales where 10·tf·S overflows 2^53 the scaled form is
  * only a certification artifact anyway — [[score]] computes the
  * normalized form directly.)
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** THE idf column — ln(1 + (N − df + 0.5)/(df + 0.5)), the Lucene
    * positive convention. Single shared builder: [[score]],
    * [[Bm25Index.searchStored]] and [[Bm25Index.scoreInline]] all
    * spec-assert bit-level parity with each other, which only holds
    * while they build the IDENTICAL expression tree — never re-type
    * this formula at a call site.
    */
  private[operators] def idfCol(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs - df + 0.5) / (df + 0.5))

  /** THE tf-normalization column — tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)).
    * Same single-builder contract as [[idfCol]]. */
  private[operators] def tfNormCol(tf: Column, dl: Column, avgdl: Column,
                                   k1: Double, b: Double): Column =
    (tf * (k1 + 1)).cast("double") /
      (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / avgdl))

  /** Shared whitespace tokenizer (the corpus-wide convention every
    * text operator and oracle replays). */
  private[operators] def toksCol(textCol: String): Column =
    split(trim(col(textCol)), "\\s+")

  /** Per-(doc, term) integer statistics for a fixed query term set:
    * tf, dl, df, plus corpus scalars n_docs / sum_dl and the
    * scaled-integer `tf_norm` (k1=1.2, b=0.75 — the clearing above).
    * Every column is exact-arithmetic except the single-division
    * `tf_norm`; the whole frame is DuckDB-certifiable (q73).
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String,
                query: Seq[String]): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val corpus = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("tf_norm",
        (lit(22L) * col("tf") * col("sum_dl")).cast("double") /
          (lit(10L) * col("tf") * col("sum_dl") + lit(3L) * col("sum_dl") +
            lit(9L) * col("dl") * col("n_docs")))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"), col("df"),
        col("n_docs"), col("sum_dl"), col("tf_norm"))
  }

  /** Full per-doc BM25 for a query: Σ_terms idf(t) · tfNorm(t, d),
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — always positive, the
    * Lucene convention. General k1/b (the normalized form, no integer
    * clearing). Engine-side metric; spec'd against a driver
    * reference.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            query: Seq[String], k1: Double = DefaultK1,
            b: Double = DefaultB): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val corpus = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = idfCol(col("n_docs"), col("df"))
    val tfNorm = tfNormCol(col("tf"), col("dl"), avgdl, k1, b)
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("contrib", idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("contrib")).as("bm25"))
  }

  /** DuckDB-certifiable BRACKET of the transcendental [[score]] (q78):
    * for x = (N−df+0.5)/(df+0.5) ≥ 0, x/(1+x) ≤ ln(1+x) ≤ x, and both
    * bounds clear to single IEEE divisions of exact integers —
    * idf_lo = (2N−2df+1)/(2N+2), idf_hi = (2N−2df+1)/(2df+1) — so with
    * the integer-certified `tf_norm` (q73) each per-term contribution
    * bound is a product of two bit-reproducible doubles. Per-doc sums
    * ride DECIMAL(18,6) (exact, order-independent addition — the q01
    * convention), making score_lo/score_hi hash-certifiable.
    * `in_bracket` computes the REAL ln-idf score from the same
    * integer-certified stats (ONE corpus scan — [[score]]'s own
    * code path is proven equal to this formula by the spec's driver
    * reference, and the scaled-vs-normalized tf_norm identity is
    * property-checked) and asserts lo−ε ≤ bm25 ≤ hi+ε (ε = 1e-5
    * covers the decimal quantization of each bound, ≤ 5e-7/term, plus
    * tf_norm-form ulp noise) — the oracle pins it literally true, so
    * the scoring formula can never leave its certified envelope
    * without a hash mismatch.
    */
  def scoreBracket(docs: DataFrame, idCol: String, textCol: String,
                   query: Seq[String]): DataFrame = {
    val stats = termStats(docs, idCol, textCol, query)
    val idfLo = (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))
      .cast("double") / (lit(2L) * col("n_docs") + lit(2L))
    val idfHi = (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))
      .cast("double") / (lit(2L) * col("df") + lit(1L))
    val idfLn = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    stats
      .withColumn("c_lo", (col("tf_norm") * idfLo).cast("decimal(18,6)"))
      .withColumn("c_hi", (col("tf_norm") * idfHi).cast("decimal(18,6)"))
      .withColumn("c_ln", col("tf_norm") * idfLn)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("c_lo")).cast("double").as("score_lo"),
        sum(col("c_hi")).cast("double").as("score_hi"),
        sum(col("c_ln")).as("bm25"))
      .withColumn("in_bracket",
        col("bm25") >= col("score_lo") - 1e-5 &&
          col("bm25") <= col("score_hi") + 1e-5)
      .select(col("doc_id"), col("n_terms_hit"),
        col("score_lo"), col("score_hi"), col("in_bracket"))
  }

  /** Top-k retrieval: [[score]] then a GLOBAL top-k. `orderBy.limit`
    * plans as TakeOrderedAndProject — per-partition heaps merged on
    * the driver, k rows of driver state — never a full sort shuffle
    * (spec-pinned), so "give me the 100 best documents out of 10^10"
    * costs one pass over the per-doc scores.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k: Int, k1: Double = DefaultK1,
           b: Double = DefaultB): DataFrame =
    score(docs, idCol, textCol, query, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
}
