package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model fit + document scoring — the n-gram-LM
  * quality-filter step of a curation pipeline (the CCNet / KenLM
  * recipe: score every crawled document under a small LM, keep the
  * low-perplexity tail). Reference analogue: none (driver-brief
  * operator family, like [[Importance]]).
  *
  * Scale design (the 100 TB shape):
  *
  *  - the MODEL is a pair of count tables keyed by 64-bit xxhash64
  *    grams — (gram_hash, c2) for bigrams, (prefix_hash, c1) for
  *    prefix occurrences — built with one groupBy shuffle each over
  *    hashes, never strings ([[Importance]]'s convention, certified
  *    by q58's string-built oracle). At web scale these are
  *    vocab-sized distributed tables, NOT driver state.
  *  - SCORING is occurrences ⋈ bigrams ⋈ prefixes on the hash keys —
  *    two equi-joins AQE can broadcast when the model is small and
  *    shuffle when it isn't. Documents never ride a shuffle; only
  *    (doc_id, hash) pairs do.
  *  - add-one smoothing over prefix counts: p(w2|w1) =
  *    (c(w1,w2)+1) / (c1(w1)+V), V = distinct-token vocabulary size.
  *
  * Two scoring forms, one correctness strategy:
  *
  *  - [[likelihoodMass]] emits integer masses Σ(c2+1) and Σ(c1+V)
  *    plus their SINGLE IEEE division as `score` — exactly
  *    reproducible by an engine that rebuilds grams as strings
  *    (DuckDB, q72), so the model counts and join shape are
  *    hash-certifiable.
  *  - [[perplexity]] is the real per-doc metric, 2^(avg −log2 p):
  *    transcendental, so engine-specific — spec'd against a
  *    driver-side reference instead of the oracle.
  */
object NgramLM {

  /** The fitted model: distributed count tables + vocab size. `vocab`
    * is the distinct-token table backing EXACT vocab accounting across
    * accretion ([[appendToStored]] anti-joins new batches against it);
    * vocab-sized like the count tables, absent only on hand-built
    * models (then accretion falls back to the documented over-count).
    */
  final case class Model(bigrams: DataFrame, prefixes: DataFrame,
                         vocabSize: Long, vocab: Option[DataFrame] = None,
                         order: Int = 2)

  private def toks(textCol: String): Column =
    split(trim(col(textCol)), "\\s+")

  /** One row per bigram occurrence: (doc_id, prefix_hash, gram_hash).
    * Grams ride as 64-bit hashes from the scan on (q58's convention);
    * the gram string is `w1  w2`, the prefix just `w1`.
    */
  def gramOccurrences(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = gramOccurrences(docs, idCol, textCol, 2)

  /** Order-n form (CCNet runs a 5-gram KenLM; the default everywhere
    * else here is the bigram): the gram is the n-token window, the
    * prefix its first n−1 tokens — count tables, scoring joins,
    * accretion and the string-gram oracle replay are order-agnostic
    * (q90 certifies the trigram form the way q72 certifies the
    * bigram). For order 2 the prefix hashes the single token itself
    * (no join separator), so the order-2 plan is IDENTICAL to the
    * historical bigram plan — q72's hashes are unchanged.
    */
  def gramOccurrences(docs: DataFrame, idCol: String,
                      textCol: String, order: Int): DataFrame = {
    require(order >= 2, s"need order >= 2, got $order")
    docs.select(col(idCol).as("doc_id"), toks(textCol).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= order)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n") - order), i => struct(
          xxhash64(if (order == 2) element_at(col("toks"), i + 1)
            else concat_ws("\u0001", slice(col("toks"), i + 1, lit(order - 1))))
            .as("prefix_hash"),
          xxhash64(concat_ws("\u0001", slice(col("toks"), i + 1, lit(order))))
            .as("gram_hash")))).as("g"))
      .select(col("doc_id"), col("g.prefix_hash"), col("g.gram_hash"))
  }

  /** Fit on a training corpus: two hash-keyed count shuffles + one
    * exact distinct-token count. `c1` counts PREFIX occurrences
    * (Σ_w2 c(w1,w2)), so add-one probabilities normalize by
    * construction.
    */
  def fit(docs: DataFrame, idCol: String, textCol: String,
          order: Int = 2): Model = {
    val occ = gramOccurrences(docs, idCol, textCol, order)
    val bigrams = occ.groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("c2"))
    val prefixes = occ.groupBy(col("prefix_hash"))
      .agg(count(lit(1)).as("c1"))
    val vocab = docs.select(explode(toks(textCol)).as("w")).distinct()
    val v = vocab.count()
    Model(bigrams, prefixes, v, Some(vocab), order)
  }

  private def scored(docs: DataFrame, idCol: String, textCol: String,
                     model: Model): DataFrame =
    gramOccurrences(docs, idCol, textCol, model.order)
      .join(model.bigrams, Seq("gram_hash"), "left")
      .join(model.prefixes, Seq("prefix_hash"), "left")
      .na.fill(0L, Seq("c2", "c1"))

  /** Per-doc smoothed likelihood masses: `hit_mass` = Σ(c2+1),
    * `prefix_mass` = Σ(c1+V) over the doc's bigram occurrences, and
    * `score` = hit_mass / prefix_mass — one IEEE division of two
    * exact integers, so the whole result is hash-certifiable against
    * a string-gram re-computation (q72). Unseen grams (scoring corpus
    * ⊄ fit corpus) contribute their add-one floor.
    *
    * STREAMING-COMPATIBLE: pass a streaming `docs` frame and this is
    * a stream-static join against the model tables plus a streaming
    * per-doc aggregation (update/complete output mode) — score
    * arrivals against a stored corpus LM with no extra code
    * (spec-proven against the batch scorer).
    */
  def likelihoodMass(docs: DataFrame, idCol: String, textCol: String,
                     model: Model): DataFrame =
    scored(docs, idCol, textCol, model)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("c2") + 1).cast("long").as("hit_mass"),
        sum(col("c1") + model.vocabSize).cast("long").as("prefix_mass"))
      .withColumn("score",
        col("hit_mass").cast("double") / col("prefix_mass"))

  /** Merge two fitted models — count tables are trivially mergeable
    * (outer-join + sum), so a corpus-wide LM accretes batch-by-batch
    * the way [[Importance]]'s stored counts and [[DedupIndex]] do:
    * fit(A ∪ B) ≡ merge(fit(A), fit(B)) except the EAGER `vocabSize`,
    * which over-counts tokens seen in both batches; the merged `vocab`
    * table is the exact union, so [[appendToStored]] (and any caller
    * that recounts it) gets exact accounting — the lazy-merge scalar
    * alone carries the over-count bound.
    */
  def merge(a: Model, b: Model): Model = {
    require(a.order == b.order,
      s"cannot merge models of different orders (${a.order} vs ${b.order})")
    mergeSameOrder(a, b)
  }

  private def mergeSameOrder(a: Model, b: Model): Model = Model(
    a.bigrams.withColumnRenamed("c2", "ca")
      .join(b.bigrams.withColumnRenamed("c2", "cb"), Seq("gram_hash"), "full")
      .select(col("gram_hash"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("c2")),
    a.prefixes.withColumnRenamed("c1", "ca")
      .join(b.prefixes.withColumnRenamed("c1", "cb"), Seq("prefix_hash"), "full")
      .select(col("prefix_hash"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("c1")),
    a.vocabSize + b.vocabSize,
    for (va <- a.vocab; vb <- b.vocab) yield va.union(vb).distinct(),
    a.order)

  /** Exact distinct-token count off a model's vocab table — the eager
    * companion to [[merge]]'s lazy over-counting scalar: after merging
    * overlapping models, `m.copy(vocabSize = exactVocabSize(m))`
    * restores the true V (one distinct-count job over the vocab-sized
    * union). Falls back to the stored scalar when no vocab table rides
    * the model.
    */
  def exactVocabSize(m: Model): Long =
    m.vocab.map(_.distinct().count()).getOrElse(m.vocabSize)

  /** Persist a fitted model as BUCKETED tables (`<name>_bigrams`
    * bucketed on gram_hash, `<name>_prefixes` on prefix_hash,
    * `<name>_vocab` distinct tokens bucketed on the token, plus a
    * 1-row `<name>_meta` with the vocab size): the [[DedupIndex]] /
    * [[IvfIndex]] stored-index pattern. Scoring a daily batch against
    * a stored web-scale LM then shuffles ONLY the batch — the count
    * tables come off disk already hash-partitioned on the join key,
    * so the stored side never exchanges (plan-asserted in the spec).
    * The vocab table is what makes accretion's vocab accounting EXACT
    * (see [[appendToStored]]); models without one (hand-built) skip it.
    */
  def store(model: Model, name: String, buckets: Int = 32): Unit = {
    model.bigrams.write.mode("overwrite")
      .bucketBy(buckets, "gram_hash").sortBy("gram_hash")
      .saveAsTable(s"${name}_bigrams")
    model.prefixes.write.mode("overwrite")
      .bucketBy(buckets, "prefix_hash").sortBy("prefix_hash")
      .saveAsTable(s"${name}_prefixes")
    model.vocab.foreach(_.write.mode("overwrite")
      .bucketBy(buckets, "w").sortBy("w")
      .saveAsTable(s"${name}_vocab"))
    val spark = model.bigrams.sparkSession
    import spark.implicits._
    Seq((model.vocabSize, model.order)).toDF("vocab_size", "gram_order")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  /** Reload a stored model; the count DataFrames carry the bucket
    * spec, so joins on their keys skip the stored-side exchange.
    * Meta written before the order column existed reads as order 2
    * (the only order that ever produced such a store).
    */
  def load(spark: org.apache.spark.sql.SparkSession, name: String): Model = {
    val meta = spark.table(s"${name}_meta").head()
    Model(spark.table(s"${name}_bigrams"), spark.table(s"${name}_prefixes"),
      meta.getLong(0),
      if (spark.catalog.tableExists(s"${name}_vocab"))
        Some(spark.table(s"${name}_vocab")) else None,
      if (meta.length > 1) meta.getInt(1) else 2)
  }

  /** Accrete a batch into a stored model: merge the batch's counts
    * into the bucketed tables (rewrite — count tables are vocab-sized
    * but contracted; the corpus itself is never rescanned) and grow
    * the vocab EXACTLY: the batch's distinct tokens anti-join the
    * stored `<name>_vocab` table (bucketed on the token — the stored
    * side reads pre-partitioned), and only genuinely new tokens bump
    * the count, so `append ≡ refit` holds INCLUDING the smoothing
    * denominator V even when batches overlap. A store written without
    * a vocab table falls back to the documented per-batch over-count.
    *
    * CRASH DISCIPLINE (r12 — the last stored index without one; a
    * plain in-place rewrite here could crash between the bigram and
    * prefix overwrites, leaving a SILENTLY mixed model, and prefixes
    * cannot be re-derived from the hashed bigram table): the rewrite
    * stages every table beside the live one, writes a commit-marker
    * table, then swaps stage → live and drops the marker. Entry repair
    * ([[recoverStored]], run automatically here) classifies any crash
    * unambiguously: marker present → the staged model is complete,
    * roll FORWARD; marker absent → the append never committed, drop
    * stray stages and let the caller retry. `batchTag` makes the retry
    * itself safe: every committed tag persists in a tiny `<name>_tags`
    * table (staged and swapped WITH the counts, so the two can never
    * disagree), and an append whose tag is ALREADY COMMITTED — the
    * last one or any older one (out-of-order recovery, multi-writer
    * misuse) — is a no-op (the [[graft.streaming.CurationIngest]]
    * replay rule). Without a tag, re-running a COMMITTED append
    * double-counts, exactly like re-COPYing a file without the
    * loader's ledger.
    *
    * `tagRetention` bounds the committed-tag set (r14, the r13 verdict's
    * O(n²) finding): each tagged append rewrites the full tag table, so
    * at per-micro-batch cadence an unbounded set grows linearly forever
    * and cumulative rewrite work is quadratic. With retention N, only
    * the N most-recent tags (by commit order) survive each swap — a
    * replay of a RETAINED tag still no-ops; a tag older than the
    * retention horizon can no longer be recognized, so the caller must
    * size N to its replay horizon (a Structured Streaming accretion
    * replays at most the last uncommitted batch — single digits; the
    * default keeps every tag, the pre-r14 behavior).
    */
  def appendToStored(spark: org.apache.spark.sql.SparkSession, name: String,
                     batch: DataFrame, idCol: String, textCol: String,
                     buckets: Int = 32,
                     batchTag: Option[String] = None,
                     owner: String = graft.operators.WriterLease.jvmOwner,
                     tagRetention: Int = Int.MaxValue): Model =
    appendToStoredImpl(spark, name, batch, idCol, textCol, buckets, batchTag,
      owner, tagRetention)

  /** `crashAfterStep` test seam (the [[StoredMerge]] recipe): 1 =
    * stages written (pre-marker → retry re-appends), 2 = marker
    * written (pre-swap → roll forward), 3 = mid-swap after the first
    * live drop (→ roll forward).
    */
  private[graft] def appendToStoredImpl(spark: org.apache.spark.sql.SparkSession,
      name: String, batch: DataFrame, idCol: String, textCol: String,
      buckets: Int, batchTag: Option[String],
      owner: String = graft.operators.WriterLease.jvmOwner,
      tagRetention: Int = Int.MaxValue,
      crashAfterStep: Int = Int.MaxValue): Model = {
    // retention below 1 would trim away the very tag being committed in
    // its own staged swap — an immediate replay of that batch then
    // double-counts SILENTLY, defeating the replay guard the tag exists
    // for. Nonsensical retention fails loudly instead (r14 ADVICE).
    require(tagRetention >= 1,
      s"tagRetention must be >= 1 (got $tagRetention): the tag being " +
        "committed must itself survive the swap, or replays double-count")
    // single writer, lease-enforced (the StoredMerge rule): two jobs
    // accreting one stored LM would interleave staged swaps, and one's
    // entry recovery could drop the other's in-flight stage — the lock
    // rides the model's warehouse path; `owner` lets same-JVM jobs
    // with distinct writer identities conflict
    WriterLease.withLease(spark, WriterLease.tableStatePath(spark, name), owner) {
      appendUnderLease(spark, name, batch, idCol, textCol, buckets,
        batchTag, tagRetention, crashAfterStep)
    }
  }

  private def appendUnderLease(spark: org.apache.spark.sql.SparkSession,
      name: String, batch: DataFrame, idCol: String, textCol: String,
      buckets: Int, batchTag: Option[String], tagRetention: Int,
      crashAfterStep: Int): Model = {
    recoverStored(spark, name)
    if (batchTag.exists(committedTags(spark, name).contains))
      return load(spark, name) // replayed append: already committed
    val stored = load(spark, name)
    val batchModel = fit(batch, idCol, textCol, stored.order)
    val merged = merge(stored, batchModel)
    // exact vocab: stored tokens + the batch's anti-joined novelty
    val (vocabSize, vocabOut) = (stored.vocab, batchModel.vocab) match {
      case (Some(sv), Some(bv)) =>
        val newToks = bv.join(sv, Seq("w"), "left_anti")
        (stored.vocabSize + newToks.count(), Some(sv.union(newToks)))
      case _ => (merged.vocabSize, None)
    }
    // stage the whole next model BESIDE the live tables (live model
    // untouched and readable throughout the batch-sized rewrite)
    merged.bigrams.write.mode("overwrite")
      .bucketBy(buckets, "gram_hash").sortBy("gram_hash")
      .saveAsTable(s"${name}__stage_bigrams")
    merged.prefixes.write.mode("overwrite")
      .bucketBy(buckets, "prefix_hash").sortBy("prefix_hash")
      .saveAsTable(s"${name}__stage_prefixes")
    vocabOut.foreach(_.write.mode("overwrite")
      .bucketBy(buckets, "w").sortBy("w")
      .saveAsTable(s"${name}__stage_vocab"))
    import spark.implicits._
    Seq((vocabSize, stored.order, batchTag.orNull))
      .toDF("vocab_size", "gram_order", "batch_tag")
      .write.mode("overwrite").saveAsTable(s"${name}__stage_meta")
    // the committed-tag SET rides the same staged swap as the counts,
    // so it can never record a tag whose counts didn't land (or vice
    // versa): stage = live tags ∪ this tag, trimmed to the
    // `tagRetention` most-recent by commit sequence (`seq`, assigned
    // monotonically here; legacy rows without one tie at 0 = oldest).
    // An append without a tag stages nothing — the live tag table
    // survives the swap untouched.
    batchTag.foreach { tag =>
      val live = committedTagSeqs(spark, name)
      val nextSeq = if (live.isEmpty) 0L else live.values.max + 1L
      val all = (live + (tag -> nextSeq)).toSeq
      val kept =
        if (all.size <= tagRetention) all
        else all.sortBy { case (t, s) => (-s, t) }.take(tagRetention)
      kept.toDF("tag", "seq")
        .write.mode("overwrite").saveAsTable(s"${name}__stage_tags")
    }
    if (crashAfterStep <= 1)
      throw new IllegalStateException("simulated crash after stage writes")
    // the commit point: marker present = staged model complete, the
    // only consistent continuation is forward
    Seq(1).toDF("ok").write.mode("overwrite").saveAsTable(s"${name}__commit")
    if (crashAfterStep <= 2)
      throw new IllegalStateException("simulated crash after commit marker")
    completeSwap(spark, name, crashMidSwap = crashAfterStep <= 3)
    // mixed-session correctness (the DedupIndex.appendCorpus rule):
    // the stage writes may run through the batch frame's session (a
    // foreachBatch clone) — refresh so the CALLER's session drops any
    // stale file listing before the reload below
    (Seq(s"${name}_bigrams", s"${name}_prefixes", s"${name}_meta") ++
      Seq(s"${name}_vocab", s"${name}_tags").filter(spark.catalog.tableExists))
      .foreach(spark.catalog.refreshTable)
    load(spark, name)
  }

  private val storeParts = Seq("bigrams", "prefixes", "vocab", "meta", "tags")

  /** Every RETAINED committed batch tag with its commit sequence — the
    * tiny `<name>_tags` table (one row per committed tagged append,
    * bounded by the caller's `tagRetention`), so a replay of any
    * retained tag no-ops, not just the immediately-preceding one
    * (out-of-order recovery, multi-writer misuse). Legacy codecs: a
    * store from before the tags table carries at most the LATEST tag
    * in its meta row — fold it in at seq 0; a tags table from before
    * the `seq` column (r14) reads every tag at seq 0 (tied-oldest, so
    * retention drops them first). Tag cardinality ≤ max(retention,
    * committed appends): driver-side by construction.
    */
  private def committedTagSeqs(spark: org.apache.spark.sql.SparkSession,
                               name: String): Map[String, Long] = {
    val tagged: Map[String, Long] =
      if (spark.catalog.tableExists(s"${name}_tags")) {
        val t = spark.table(s"${name}_tags")
        val hasSeq = t.columns.contains("seq")
        t.collect().map(r =>
          r.getString(0) -> (if (hasSeq) r.getLong(1) else 0L)).toMap
      } else Map.empty
    val row = spark.table(s"${name}_meta").head()
    val legacy =
      if (row.schema.fieldNames.contains("batch_tag"))
        Option(row.getAs[String]("batch_tag"))
      else None
    legacy.filterNot(tagged.contains).map(_ -> 0L).toMap ++ tagged
  }

  private def committedTags(spark: org.apache.spark.sql.SparkSession,
                            name: String): Set[String] =
    committedTagSeqs(spark, name).keySet

  /** Swap every staged table in (drop live, rename stage), then drop
    * the commit marker. Idempotent under crashes at any point: a part
    * whose stage is gone has already swapped; a part whose live is
    * missing mid-pair just renames in.
    */
  private def completeSwap(spark: org.apache.spark.sql.SparkSession,
                           name: String, crashMidSwap: Boolean = false): Unit = {
    var first = true
    storeParts.foreach { t =>
      val stage = s"${name}__stage_$t"
      if (spark.catalog.tableExists(stage)) {
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t")
        if (crashMidSwap && first)
          throw new IllegalStateException("simulated crash mid-swap")
        first = false
        spark.sql(s"ALTER TABLE $stage RENAME TO ${name}_$t")
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS ${name}__commit")
  }

  /** Entry repair for an interrupted [[appendToStored]] — safe to call
    * any time (no-op on a clean store): commit marker present → the
    * staged model is complete, finish the swap (the append LANDS; a
    * tagged retry then no-ops); marker absent → the append never
    * committed, drop stray stage tables (the live model was never
    * touched; retry the append).
    */
  def recoverStored(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    if (spark.catalog.tableExists(s"${name}__commit"))
      completeSwap(spark, name)
    else
      storeParts.foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}__stage_$t"))

  /** Per-doc bigram perplexity, 2^(avg −log2 p(w2|w1)) with add-one
    * smoothing — the number the CCNet filter thresholds on. Uses
    * transcendental ops, so certified by spec (driver-side reference
    * parity), not by the DuckDB oracle.
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 model: Model): DataFrame =
    scored(docs, idCol, textCol, model)
      .withColumn("nll",
        -log2((col("c2") + 1).cast("double") /
          (col("c1") + model.vocabSize)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        avg(col("nll")).as("avg_nll"))
      .withColumn("perplexity", pow(lit(2.0), col("avg_nll")))
}
