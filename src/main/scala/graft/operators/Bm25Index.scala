package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored inverted-index form of [[Bm25]] — score queries against a
  * web-scale corpus WITHOUT rescanning it. Reference analogue: none
  * (driver-brief retrieval family); the BM25 formula is Robertson–
  * Spärck Jones with the Lucene positive idf, identical to [[Bm25]].
  *
  * This completes the stored/mergeable-model family ([[DedupIndex]],
  * [[IvfIndex]], [[NgramLM]], [[Importance]], [[BpeDict]]): every
  * statistic BM25 needs is a sum, so the index accretes batch-by-batch
  * with `append ≡ rebuild` (spec-proven, including overlapping term
  * vocabularies — doc_ids must be fresh, see [[appendToStored]]).
  *
  * Scale design (the 100 TB shape):
  *  - `<name>_postings` (term, doc_id, tf, dl) — one row per distinct
  *    (doc, term), BUCKETED AND SORTED ON term: a query's scan prunes
  *    to the buckets holding its terms (`SelectedBucketsCount` in the
  *    plan — spec-pinned), so query cost scales with posting-list
  *    length, not corpus size. dl is denormalized into the row so
  *    scoring needs no doc-length join.
  *  - `<name>_terms` (term, df) — vocab-sized, bucketed on term;
  *    accretion merges it with an outer-join sum (the [[NgramLM]]
  *    count-table rule). df is Σ over batches because a doc appears
  *    in exactly one batch.
  *  - `<name>_meta` — 1-row (n_docs, sum_dl) corpus scalars.
  *  - appending a batch APPENDS to postings (O(batch) — the corpus
  *    tables are never rewritten) and rewrites only the contracted
  *    terms/meta tables.
  */
object Bm25Index {

  /** The index as DataFrames + corpus scalars (eager, like
    * [[NgramLM.fit]]'s vocab count — two longs off one aggregate). */
  final case class Index(postings: DataFrame, terms: DataFrame,
                         nDocs: Long, sumDl: Long)

  private def toks(textCol: String) = Bm25.toksCol(textCol)

  /** The postings frame for a corpus — the index's SOURCE OF TRUTH
    * (terms/df and the corpus scalars are all derivable from it, see
    * [[derive]]/[[repairStored]]). */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), toks(textCol).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))

  /** Re-derive the terms table and corpus scalars from a postings
    * frame: df per term, and the doc-level (n_docs, sum_dl) off the
    * distinct (doc_id, dl) contraction — every doc has ≥ 1 posting
    * row (the tokenizer emits [""] even for empty text), so nothing
    * is lost. */
  private def derive(postings: DataFrame): Index = {
    val terms = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scalars = postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    Index(postings, terms, scalars.getLong(0),
      if (scalars.isNullAt(1)) 0L else scalars.getLong(1))
  }

  /** Build from a corpus: one groupBy((doc, term)) shuffle for tf, one
    * groupBy(term) contraction for df, one scalar aggregate. */
  def build(docs: DataFrame, idCol: String, textCol: String): Index =
    derive(postingsOf(docs, idCol, textCol))

  /** Persist as bucketed tables (the [[NgramLM.store]] layout). */
  def store(index: Index, name: String, buckets: Int = 32): Unit = {
    index.postings.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_postings")
    index.terms.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_terms")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq((index.nDocs, index.sumDl)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  /** Reload; the postings/terms frames carry the bucket spec. */
  def load(spark: SparkSession, name: String): Index = {
    val meta = spark.table(s"${name}_meta").head()
    Index(spark.table(s"${name}_postings"), spark.table(s"${name}_terms"),
      meta.getLong(0), meta.getLong(1))
  }

  /** Accrete a batch: postings APPEND under the same bucket spec (new
    * rows only — O(batch) write, the stored postings are never read or
    * rewritten), terms merge via outer-join sum (vocab-sized rewrite),
    * meta scalars add. The batch pipeline materializes ONCE
    * (localCheckpoint); the write, the terms delta and the scalar
    * delta all read the checkpoint. REQUIRES fresh doc_ids — admit the
    * batch through exact dedup ([[DedupIndex.admit]]'s pattern) first;
    * a re-sent doc would double-count tf and df exactly as re-COPYing
    * a file without the loader's ledger would double-load it.
    *
    * Failure semantics: the three writes are not one transaction, but
    * postings go FIRST and are the source of truth — if a later
    * derived-table write dies, run [[repairStored]] (recomputes
    * terms/meta from postings); do NOT re-append the batch. If the
    * postings append itself dies mid-write, Spark's table commit
    * protocol rolls the files back and nothing changed.
    */
  def appendToStored(spark: SparkSession, name: String, batch: DataFrame,
                     idCol: String, textCol: String,
                     buckets: Int = 32): Index = {
    val bp = postingsOf(batch, idCol, textCol).localCheckpoint()
    val b = derive(bp)
    bp.write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_postings")
    val stored = load(spark, name)
    val mergedTerms = stored.terms.withColumnRenamed("df", "da")
      .join(b.terms.withColumnRenamed("df", "db"), Seq("term"), "full")
      .select(col("term"),
        (coalesce(col("da"), lit(0L)) + coalesce(col("db"), lit(0L))).as("df"))
      .localCheckpoint() // materialize BEFORE overwriting the table being read
    mergedTerms.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_terms")
    import spark.implicits._
    Seq((stored.nDocs + b.nDocs, stored.sumDl + b.sumDl))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    // mixed-session correctness (the DedupIndex.appendCorpus rule): the
    // postings append runs through the BATCH frame's session, which may
    // be a foreachBatch clone — refresh so the caller's session drops
    // its stale pre-append file listing
    spark.catalog.refreshTable(s"${name}_postings")
    load(spark, name)
  }

  /** Rebuild the derived tables (`_terms`, `_meta`) from the stored
    * postings — the recovery arm for an accretion that died between
    * the postings append and the derived writes (see
    * [[appendToStored]]'s failure semantics). Idempotent: repairing a
    * healthy index is a no-op rewrite of identical contents.
    */
  def repairStored(spark: SparkSession, name: String,
                   buckets: Int = 32): Index = {
    val idx = derive(spark.table(s"${name}_postings"))
    idx.terms.localCheckpoint().write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_terms")
    import spark.implicits._
    Seq((idx.nDocs, idx.sumDl)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    load(spark, name)
  }

  /** Score a term-set query against the index: the postings scan
    * carries an `isin` filter Spark turns into bucket pruning + a
    * sorted-scan predicate, the query's (term, df) rows broadcast, and
    * the only shuffle is the per-doc contribution fold. Same formula
    * and column contract as [[Bm25.score]] (row-parity spec'd; the
    * envelope is hash-certified through q78's bracket).
    */
  def searchStored(spark: SparkSession, name: String, query: Seq[String],
                   k1: Double = Bm25.DefaultK1,
                   b: Double = Bm25.DefaultB): DataFrame = {
    val idx = load(spark, name)
    val avgdl = idx.sumDl.toDouble / math.max(idx.nDocs, 1L)
    val idf = Bm25.idfCol(lit(idx.nDocs), col("df"))
    val tfNorm = Bm25.tfNormCol(col("tf"), col("dl"), lit(avgdl), k1, b)
    idx.postings.filter(col("term").isin(query: _*))
      .join(broadcast(idx.terms.filter(col("term").isin(query: _*))),
        Seq("term"))
      .withColumn("contrib", idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("contrib")).as("bm25"))
  }

  /** Global top-k hits — `orderBy.limit` plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def topKStored(spark: SparkSession, name: String, query: Seq[String],
                 k: Int): DataFrame =
    searchStored(spark, name, query)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)

  /** Score EXTERNAL documents (not the indexed corpus) against the
    * index's statistics, as a STATELESS per-row projection: the
    * query's (term, df) rows — bounded by |query| — are collected and
    * embedded as literals (the [[IvfIndex]] probe-broadcast rule), and
    * each term's tf comes from an in-row `filter(toks, ...)` count, so
    * the whole score needs NO shuffle, NO join, and NO aggregation.
    * That makes it:
    *  - the zero-exchange batch form for topical corpus filtering
    *    ("score every crawled page against these fixed topic terms"):
    *    pure codegen map work at the scan; and
    *  - directly streamable in APPEND mode with no state store — a
    *    micro-batch topical gate over arrivals (spec-proven, plan
    *    asserted stateless) — where the two-aggregation shape of
    *    [[Bm25.score]] cannot run as a streaming query at all.
    * Emits every doc with `n_terms_hit > 0` and the same idf/tfNorm
    * formula as [[Bm25.score]] (row-parity spec'd; per-doc float sums
    * run in fixed query order rather than aggregation order, so equal
    * up to ulp-level addition reordering).
    */
  def scoreInline(docs: DataFrame, idCol: String, textCol: String,
                  index: Index, query: Seq[String],
                  k1: Double = Bm25.DefaultK1,
                  b: Double = Bm25.DefaultB): DataFrame = {
    val dfMap = index.terms.filter(col("term").isin(query: _*))
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    val avgdl = index.sumDl.toDouble / math.max(index.nDocs, 1L)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        toks(textCol).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val terms = query.distinct.filter(dfMap.contains)
    val contribs = terms.map { t =>
      val df = dfMap(t)
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("long")
      // same expression builders as Bm25.score, df/N as literals
      val idf = Bm25.idfCol(lit(index.nDocs), lit(df))
      val tfNorm = Bm25.tfNormCol(tf, col("dl"), lit(avgdl), k1, b)
      when(tf > 0, idf * tfNorm)
    }
    val hit = contribs.map(c => when(c.isNotNull, 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val score = contribs.map(c => coalesce(c, lit(0.0)))
      .reduceOption(_ + _).getOrElse(lit(0.0))
    base.withColumn("n_terms_hit", hit)
      .withColumn("bm25", score)
      .filter(col("n_terms_hit") > 0)
      .select(col("doc_id"), col("n_terms_hit"), col("bm25"))
  }
}
