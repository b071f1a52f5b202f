package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, expressions => gx}

/** Positional inverted index + exact phrase search — the classic
  * IR positional-postings design (Manning/Raghavan/Schütze ch. 2):
  * postings carry each term's sorted in-document positions, and a
  * phrase `t0 t1 … tm` matches where the lists align with offsets
  * (`p ∈ pos(t0)` with `p + i ∈ pos(ti)` for all i). Extends the
  * retrieval family ([[Bm25]], [[Bm25Index]]) from bag-of-words to
  * sequence-aware queries WITHOUT rescanning text. Reference
  * analogue: none (driver-brief retrieval family).
  *
  * Scale design (100 TB): postings are one (term, doc_id) hash
  * aggregate over posexploded tokens — positions stay small arrays
  * riding the shuffle once at build time. Stored, the table is
  * BUCKETED AND SORTED ON term (the [[Bm25Index]] layout), so a
  * phrase query scans only its terms' buckets; the per-phrase join
  * chain is keyed on doc_id over term-filtered posting lists (the
  * rarest term's list bounds the fan-in — standard IR practice puts
  * the join order by ascending df; Catalyst's AQE reorders the
  * broadcast-sized legs at runtime). Alignment itself is a codegen'd
  * higher-order `filter` over the first term's position array — no
  * explode, no per-position shuffle.
  */
object PhraseIndex {

  /** Positional postings: `(term, doc_id, positions)` with positions
    * 0-based token indexes, sorted ascending. One row per distinct
    * (term, doc).
    */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Persist bucketed+sorted on term so phrase queries bucket-prune
    * (the [[Bm25Index.store]] layout). */
  def store(postings: DataFrame, name: String, buckets: Int = 32): Unit =
    postings.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_positions")

  /** NOTE: phrase queries join posting lists on doc_id, not term, so
    * Spark's DisableUnnecessaryBucketedScan rule turns the bucketed
    * scan (and with it bucket PRUNING on the term filter) off. Set
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` for
    * the query session to keep the pruned scan
    * (`SelectedBucketsCount` — spec-pinned).
    */
  def load(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_positions")

  /** Documents matching the exact phrase, with occurrence counts:
    * `(doc_id, n_occ)`, n_occ ≥ 1. Duplicate terms in the phrase are
    * handled by the alignment itself (`"x x"` in `"x x x"` = 2
    * occurrences).
    */
  def phraseHits(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = legs.reduce((a, b) => a.join(b, Seq("doc_id")))
    val occ =
      if (phrase.size == 1) size(col("p0"))
      else {
        val cond = (1 until phrase.size)
          .map(i => s"array_contains(p$i, p + $i)").mkString(" AND ")
        expr(s"size(filter(p0, p -> $cond))")
      }
    joined.select(col("doc_id"), occ.cast("long").as("n_occ"))
      .filter(col("n_occ") >= 1)
  }

  /** Row-local phrase matching — per document, the occurrence count
    * of each phrase via m-gram equality over the token array
    * ([[graft.functions.Shingles]], one codegen'd pass per phrase
    * length). No index, no shuffle, no state: composes into scans and
    * Structured Streaming queries unchanged (the admission-gate /
    * contamination-block use case), and is parity-pinned to
    * [[phraseHits]] by spec. Output: the input columns +
    * `phrase_hits: map<string, long>` with one entry per MATCHED
    * phrase.
    */
  def matchInline(df: DataFrame, textCol: String,
                  phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty, "no phrases")
    val toks = TextFunctions.tokens(col(textCol))
    val counts = phrases.map { ph =>
      val phraseStr = ph.mkString(" ")
      // guard the shorter-than-m fallback gram: it only counts when the
      // whole document IS the phrase
      val occ = when(size(toks) < ph.size,
          when(concat_ws(" ", toks) === phraseStr, 1L).otherwise(0L))
        .otherwise(size(filter(gx.shingles_fast(toks, ph.size),
          g => g === lit(phraseStr))).cast("long"))
      struct(lit(phraseStr).as("p"), occ.as("c"))
    }
    df.withColumn("phrase_hits",
      map_from_entries(filter(array(counts: _*), s => s.getField("c") > 0)))
  }

  /** Corpus-level phrase report over several phrases: per phrase the
    * matching-document count and total occurrence count.
    */
  def search(postings: DataFrame, phrases: Seq[Seq[String]]): DataFrame =
    phrases.map { ph =>
      phraseHits(postings, ph)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_occ")), lit(0L)).cast("long").as("n_occ"))
        .select(lit(ph.mkString(" ")).as("phrase"), col("n_docs"), col("n_occ"))
    }.reduce(_.unionAll(_))
}
