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

  /** Reload a stored model. With no pending deltas (every scoring
    * model; an accretion model right after compaction) this is the
    * BASE model verbatim — the count DataFrames carry the bucket spec,
    * so joins on their keys skip the stored-side exchange. With
    * pending deltas ([[appendDeltaToStored]] commits between
    * compactions), the counts COMPOSE lazily — base FULL-OUTER-JOIN
    * the committed deltas' per-key sums — and the vocab size is
    * recounted exactly (one distinct-count job over the vocab-sized
    * union; the composed count sides also lose the base's
    * exchange-free bucket property until the next compaction). Run
    * [[compactStored]] before putting an accretion model on a hot
    * scoring path. Meta written before the order column existed reads
    * as order 2 (the only order that ever produced such a store).
    */
  def load(spark: org.apache.spark.sql.SparkSession, name: String): Model = {
    val base = loadBase(spark, name)
    val pending = pendingDeltaTagSeqs(spark, name)
    if (pending.isEmpty) base
    else {
      val tags = pending.keySet.toSeq
      val dBig = spark.table(s"${name}_delta_bigrams")
        .filter(col("tag").isin(tags: _*))
        .groupBy(col("gram_hash")).agg(sum(col("c2")).as("c2"))
      val dPre = spark.table(s"${name}_delta_prefixes")
        .filter(col("tag").isin(tags: _*))
        .groupBy(col("prefix_hash")).agg(sum(col("c1")).as("c1"))
      val dVoc = spark.table(s"${name}_delta_vocab")
        .filter(col("tag").isin(tags: _*)).select(col("w")).distinct()
      val sv = base.vocab.getOrElse(throw new IllegalStateException(
        s"stored LM $name has pending deltas but no ${name}_vocab table — " +
          "delta appends require one (appendDeltaToStored enforces this)"))
      val vocabUnion = sv.union(dVoc.join(sv, Seq("w"), "left_anti"))
      val composed = mergeSameOrder(base,
        Model(dBig, dPre, 0L, None, base.order))
      Model(composed.bigrams, composed.prefixes,
        vocabUnion.count(), Some(vocabUnion), base.order)
    }
  }

  /** The stored BASE tables only — what [[load]] returns when no
    * deltas are pending, and what compaction merges into. */
  private def loadBase(spark: org.apache.spark.sql.SparkSession,
                       name: String): Model = {
    val meta = spark.table(s"${name}_meta").head()
    Model(spark.table(s"${name}_bigrams"), spark.table(s"${name}_prefixes"),
      meta.getLong(0),
      if (spark.catalog.tableExists(s"${name}_vocab"))
        Some(spark.table(s"${name}_vocab")) else None,
      if (meta.length > 1) meta.getInt(1) else 2)
  }

  /** Accrete a batch into a stored model in ONE call: merge the
    * batch's counts into the bucketed tables (a full-model rewrite —
    * count tables are vocab-sized but contracted; the corpus itself is
    * never rescanned) and grow the vocab EXACTLY. O(model) per call:
    * for per-micro-batch cadence use [[appendDeltaToStored]] (O(batch))
    * + periodic [[compactStored]] instead — this one-shot form suits
    * occasional day-sized accretions, and it compacts any pending
    * deltas first so mixed usage stays exact. Vocab accounting: the batch's distinct tokens anti-join the
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
    // mixed usage: a full append's merge must not fold pending DELTA
    // counts into the base while their partitions (and tags) stay in
    // the delta tables — the composed reader would then double-count.
    // Compact first (already under this lease); the base is then the
    // whole committed model.
    if (pendingDeltaTagSeqs(spark, name).nonEmpty)
      compactUnderLease(spark, name, buckets, tagRetention, Int.MaxValue)
    val stored = loadBase(spark, name)
    val batchModel = fit(batch, idCol, textCol, stored.order)
    val merged = merge(stored, batchModel)
    // exact vocab: stored tokens + the batch's anti-joined novelty
    val (vocabSize, vocabOut) = (stored.vocab, batchModel.vocab) match {
      case (Some(sv), Some(bv)) =>
        val newToks = bv.join(sv, Seq("w"), "left_anti")
        (stored.vocabSize + newToks.count(), Some(sv.union(newToks)))
      case _ => (merged.vocabSize, None)
    }
    // the committed-tag SET rides the same staged swap as the counts,
    // so it can never record a tag whose counts didn't land (or vice
    // versa): stage = live tags ∪ this tag, trimmed to the
    // `tagRetention` most-recent by commit sequence (`seq`, assigned
    // monotonically here; legacy rows without one tie at 0 = oldest).
    // An append without a tag stages nothing — the live tag table
    // survives the swap untouched.
    val stagedTags = batchTag.map { tag =>
      val live = committedTagSeqs(spark, name)
      val nextSeq = if (live.isEmpty) 0L else live.values.max + 1L
      val all = (live + (tag -> nextSeq)).toSeq
      if (all.size <= tagRetention) all
      else all.sortBy { case (t, s) => (-s, t) }.take(tagRetention)
    }
    stageAndSwap(spark, name, merged.bigrams, merged.prefixes, vocabOut,
      vocabSize, stored.order, batchTag, stagedTags, buckets,
      dropDeltas = false, crashAfterStep)
    load(spark, name)
  }

  /** The shared staged-swap tail of every full-model rewrite (a tagged
    * append, a delta compaction): stage every table BESIDE the live
    * ones (live model untouched and readable throughout), write the
    * commit marker, swap stage → live, then refresh the caller's
    * relation cache. `dropDeltas` rides IN the marker: a compaction's
    * roll-forward must also drop the delta tables it folded in, even
    * when the roll-forward is a crash recovery in a later session.
    */
  private def stageAndSwap(spark: org.apache.spark.sql.SparkSession,
      name: String, bigrams: DataFrame, prefixes: DataFrame,
      vocabOut: Option[DataFrame], vocabSize: Long, order: Int,
      metaTag: Option[String], stagedTags: Option[Seq[(String, Long)]],
      buckets: Int, dropDeltas: Boolean, crashAfterStep: Int): Unit = {
    import spark.implicits._
    bigrams.write.mode("overwrite")
      .bucketBy(buckets, "gram_hash").sortBy("gram_hash")
      .saveAsTable(s"${name}__stage_bigrams")
    prefixes.write.mode("overwrite")
      .bucketBy(buckets, "prefix_hash").sortBy("prefix_hash")
      .saveAsTable(s"${name}__stage_prefixes")
    vocabOut.foreach(_.write.mode("overwrite")
      .bucketBy(buckets, "w").sortBy("w")
      .saveAsTable(s"${name}__stage_vocab"))
    Seq((vocabSize, order, metaTag.orNull))
      .toDF("vocab_size", "gram_order", "batch_tag")
      .write.mode("overwrite").saveAsTable(s"${name}__stage_meta")
    stagedTags.foreach(_.toDF("tag", "seq")
      .write.mode("overwrite").saveAsTable(s"${name}__stage_tags"))
    if (crashAfterStep <= 1)
      throw new IllegalStateException("simulated crash after stage writes")
    // the commit point: marker present = staged model complete, the
    // only consistent continuation is forward
    Seq((1, dropDeltas)).toDF("ok", "drop_deltas")
      .write.mode("overwrite").saveAsTable(s"${name}__commit")
    if (crashAfterStep <= 2)
      throw new IllegalStateException("simulated crash after commit marker")
    completeSwap(spark, name, crashMidSwap = crashAfterStep <= 3,
      crashBeforeDeltaDrop = crashAfterStep == 4)
    // mixed-session correctness (the DedupIndex.appendCorpus rule):
    // the stage writes may run through the batch frame's session (a
    // foreachBatch clone) — refresh so the CALLER's session drops any
    // stale file listing before the reload
    (Seq(s"${name}_bigrams", s"${name}_prefixes", s"${name}_meta") ++
      Seq(s"${name}_vocab", s"${name}_tags").filter(spark.catalog.tableExists))
      .foreach(spark.catalog.refreshTable)
  }

  /** Accrete a batch as a DELTA — O(batch) per call, the scale shape
    * for per-micro-batch accretion (r16; the full [[appendToStored]]
    * rewrites the whole merged model per call, O(model), which goes
    * quadratic-cumulative on long streams). The batch's count tables
    * land as one `tag=<batchTag>` partition of `<name>_delta_bigrams`
    * / `_delta_prefixes` / `_delta_vocab`; the COMMIT POINT is the tag
    * row appended to the tiny `<name>_delta_tags` table LAST — readers
    * and compaction recognize a delta only once its tag committed, so
    * a crash anywhere earlier leaves invisible orphan files that the
    * replay's drop-partition-then-append rewrite makes convergent.
    * Replays of a committed tag (delta or already-compacted) no-op.
    * Readers ([[load]]) compose base + committed deltas lazily;
    * [[compactStored]] folds them into the base — run it every N
    * batches ([[graft.streaming.CurationIngest.Config.lmCompactEvery]])
    * or at a size threshold, amortizing the model-sized rewrite.
    *
    * Requires a vocab-bearing store ([[store]] of a [[fit]] model
    * always writes one): exact smoothing-denominator accounting across
    * deltas needs the stored token set.
    */
  def appendDeltaToStored(spark: org.apache.spark.sql.SparkSession,
      name: String, batch: DataFrame, idCol: String, textCol: String,
      batchTag: String,
      owner: String = graft.operators.WriterLease.jvmOwner): Unit =
    appendDeltaToStoredImpl(spark, name, batch, idCol, textCol, batchTag, owner)

  /** `crashAfterStep` seam: 1 = bigram delta written, 2 = + prefix
    * delta, 3 = + vocab delta (tag row NOT committed → replay rewrites
    * all three partitions identically and then commits). */
  private[graft] def appendDeltaToStoredImpl(
      spark: org.apache.spark.sql.SparkSession, name: String,
      batch: DataFrame, idCol: String, textCol: String, batchTag: String,
      owner: String = graft.operators.WriterLease.jvmOwner,
      crashAfterStep: Int = Int.MaxValue): Unit = {
    require(batchTag.nonEmpty &&
      batchTag.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"batchTag '$batchTag' must be non-empty [A-Za-z0-9._-]: it names a " +
        "partition directory, so the charset must survive the path verbatim")
    WriterLease.withLease(spark, WriterLease.tableStatePath(spark, name), owner) {
      recoverStored(spark, name)
      require(spark.catalog.tableExists(s"${name}_vocab"),
        s"stored LM $name has no ${name}_vocab table: delta accretion " +
          "needs it for exact vocab accounting — seed the store from " +
          "NgramLM.fit (whose store always writes one)")
      if (!committedTags(spark, name).contains(batchTag)) {
        val order = {
          val meta = spark.table(s"${name}_meta").head()
          if (meta.length > 1) meta.getInt(1) else 2
        }
        val occ = gramOccurrences(batch, idCol, textCol, order)
        writeDelta(spark, name, "bigrams",
          occ.groupBy(col("gram_hash")).agg(count(lit(1)).as("c2")), batchTag)
        if (crashAfterStep <= 1)
          throw new IllegalStateException("simulated crash after bigram delta")
        writeDelta(spark, name, "prefixes",
          occ.groupBy(col("prefix_hash")).agg(count(lit(1)).as("c1")), batchTag)
        if (crashAfterStep <= 2)
          throw new IllegalStateException("simulated crash after prefix delta")
        writeDelta(spark, name, "vocab",
          batch.select(explode(toks(textCol)).as("w")).distinct(), batchTag)
        if (crashAfterStep <= 3)
          throw new IllegalStateException("simulated crash after vocab delta")
        // the commit point: one tiny append — lands whole or not at all
        val live = committedTagSeqs(spark, name) ++ deltaTagSeqs(spark, name)
        val nextSeq = if (live.isEmpty) 0L else live.values.max + 1L
        import spark.implicits._
        Seq((batchTag, nextSeq)).toDF("tag", "seq")
          .write.mode("append").saveAsTable(s"${name}_delta_tags")
        spark.catalog.refreshTable(s"${name}_delta_tags")
      }
    }
  }

  /** One delta partition, replay-convergent: drop the tag's partition
    * (catalog + files — a crashed append can leave files the catalog
    * never registered, which a later append would resurrect as
    * duplicates), then append the fresh rows. First write creates the
    * tag-partitioned table. */
  private def writeDelta(spark: org.apache.spark.sql.SparkSession,
      name: String, part: String, rows: DataFrame, tag: String): Unit = {
    val tbl = s"${name}_delta_$part"
    val tagged = rows.withColumn("tag", lit(tag))
    if (!spark.catalog.tableExists(tbl))
      tagged.write.partitionBy("tag").saveAsTable(tbl)
    else {
      spark.sql(s"ALTER TABLE $tbl DROP IF EXISTS PARTITION (tag='$tag')")
      val loc = new org.apache.hadoop.fs.Path(
        WriterLease.tableStatePath(spark, tbl), s"tag=$tag")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      tagged.write.mode("append").insertInto(tbl)
    }
  }

  /** Count of committed deltas awaiting compaction — the cadence /
    * threshold readout ([[graft.streaming.CurationIngest]] compacts
    * when this reaches `lmCompactEvery`). */
  def pendingDeltaCount(spark: org.apache.spark.sql.SparkSession,
                        name: String): Int =
    pendingDeltaTagSeqs(spark, name).size

  /** Fold every committed delta into the base model — ONE staged
    * full-model swap for N batches of accretion (the amortization that
    * keeps per-batch cost flat; reference convention: the stored-state
    * repair scripts ship every such discipline ops-reachable —
    * `OpsCli compactLm`). The swap's commit marker carries
    * `drop_deltas`, so a crash anywhere after the marker rolls FORWARD
    * through the delta drop ([[recoverStored]]); a crash before it
    * drops the stages and leaves the deltas intact for a retry. The
    * compacted tags join the base tag table — trimmed to
    * `tagRetention` most-recent, except every tag compacted IN THIS
    * SWAP survives it unconditionally (the reader's committed-delta
    * set is `delta tags ∖ base tags`; trimming a just-compacted tag
    * while its delta partition lingers in the marker window would
    * double-count it). Returns the number of deltas folded in (0 =
    * nothing pending, no swap ran).
    */
  def compactStored(spark: org.apache.spark.sql.SparkSession, name: String,
      buckets: Int = 32,
      owner: String = graft.operators.WriterLease.jvmOwner,
      tagRetention: Int = Int.MaxValue): Int =
    compactStoredImpl(spark, name, buckets, owner, tagRetention)

  /** `crashAfterStep` seam (the [[stageAndSwap]] steps): 1 = stages
    * written (marker absent → recovery drops stages, deltas intact),
    * 2 = marker written (roll forward: swap + delta drop), 3 =
    * mid-swap, 4 = after the renames but before the delta drop (roll
    * forward must still drop them). */
  private[graft] def compactStoredImpl(
      spark: org.apache.spark.sql.SparkSession, name: String, buckets: Int,
      owner: String = graft.operators.WriterLease.jvmOwner,
      tagRetention: Int = Int.MaxValue,
      crashAfterStep: Int = Int.MaxValue): Int = {
    require(tagRetention >= 1,
      s"tagRetention must be >= 1 (got $tagRetention)")
    WriterLease.withLease(spark, WriterLease.tableStatePath(spark, name), owner) {
      recoverStored(spark, name)
      compactUnderLease(spark, name, buckets, tagRetention, crashAfterStep)
    }
  }

  private def compactUnderLease(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int, tagRetention: Int,
      crashAfterStep: Int): Int = {
    val pending = pendingDeltaTagSeqs(spark, name)
    if (pending.isEmpty) return 0
    val tags = pending.keySet.toSeq
    val stored = loadBase(spark, name)
    val sv = stored.vocab.getOrElse(throw new IllegalStateException(
      s"stored LM $name has pending deltas but no ${name}_vocab table"))
    val dBig = spark.table(s"${name}_delta_bigrams")
      .filter(col("tag").isin(tags: _*))
      .groupBy(col("gram_hash")).agg(sum(col("c2")).as("c2"))
    val dPre = spark.table(s"${name}_delta_prefixes")
      .filter(col("tag").isin(tags: _*))
      .groupBy(col("prefix_hash")).agg(sum(col("c1")).as("c1"))
    val dVoc = spark.table(s"${name}_delta_vocab")
      .filter(col("tag").isin(tags: _*)).select(col("w")).distinct()
    val merged = mergeSameOrder(stored, Model(dBig, dPre, 0L, None, stored.order))
    val newToks = dVoc.join(sv, Seq("w"), "left_anti")
    val vocabSize = stored.vocabSize + newToks.count()
    // base tags trimmed to retention, PLUS every tag compacted in this
    // swap (unconditionally — see compactStored's contract), with the
    // deltas' commit order preserved
    val base = committedTagSeqs(spark, name)
    val trimmedBase = {
      val all = base.toSeq
      if (all.size <= tagRetention) all
      else all.sortBy { case (t, s) => (-s, t) }.take(tagRetention)
    }
    val stagedTags = (trimmedBase ++ pending.toSeq.filterNot {
      case (t, _) => base.contains(t) }).sortBy(_._2)
    stageAndSwap(spark, name, merged.bigrams, merged.prefixes,
      Some(sv.union(newToks)), vocabSize, stored.order, metaTag = None,
      stagedTags = Some(stagedTags), buckets, dropDeltas = true,
      crashAfterStep)
    pending.size
  }

  private val storeParts = Seq("bigrams", "prefixes", "vocab", "meta", "tags")
  private val deltaParts = Seq("bigrams", "prefixes", "vocab", "tags")

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

  /** Every COMMITTED tag — base tag table (full appends + compacted
    * deltas) plus the committed delta tags: the replay no-op check. */
  private def committedTags(spark: org.apache.spark.sql.SparkSession,
                            name: String): Set[String] =
    committedTagSeqs(spark, name).keySet ++ deltaTagSeqs(spark, name).keySet

  /** The committed DELTA tags with their commit sequences — the tiny
    * append-only `<name>_delta_tags` table (each row the commit point
    * of one [[appendDeltaToStored]]; dropped whole by compaction). */
  private def deltaTagSeqs(spark: org.apache.spark.sql.SparkSession,
                           name: String): Map[String, Long] =
    if (!spark.catalog.tableExists(s"${name}_delta_tags")) Map.empty
    else spark.table(s"${name}_delta_tags").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Deltas awaiting compaction: committed delta tags NOT yet in the
    * base tag table. The subtraction is what makes the
    * marker-window crash state read exactly — a compaction whose swap
    * landed but whose delta drop crashed leaves the folded tags in
    * BOTH tables, and counting those lingering partitions again would
    * double the folded batches. */
  private def pendingDeltaTagSeqs(spark: org.apache.spark.sql.SparkSession,
                                  name: String): Map[String, Long] = {
    val delta = deltaTagSeqs(spark, name)
    if (delta.isEmpty) delta
    else {
      val base = committedTagSeqs(spark, name).keySet
      delta.filterNot { case (t, _) => base.contains(t) }
    }
  }

  /** Whether the pending commit marker's swap must also drop the delta
    * tables (a compaction's marker; legacy two-column-less markers read
    * false). */
  private def markerDropsDeltas(spark: org.apache.spark.sql.SparkSession,
                                name: String): Boolean = {
    val t = spark.table(s"${name}__commit")
    t.columns.contains("drop_deltas") &&
      t.head().getAs[Boolean]("drop_deltas")
  }

  /** Swap every staged table in (drop live, rename stage), drop the
    * delta tables when the marker says this swap folded them in, then
    * drop the commit marker. Idempotent under crashes at any point: a
    * part whose stage is gone has already swapped; a part whose live
    * is missing mid-pair just renames in; the delta drops are
    * DROP IF EXISTS.
    */
  private def completeSwap(spark: org.apache.spark.sql.SparkSession,
                           name: String, crashMidSwap: Boolean = false,
                           crashBeforeDeltaDrop: Boolean = false): Unit = {
    // read the marker's flag BEFORE the renames (the marker table is
    // untouched by them, but a re-entrant recovery must classify first)
    val dropDeltas = markerDropsDeltas(spark, name)
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
    if (dropDeltas) {
      if (crashBeforeDeltaDrop)
        throw new IllegalStateException("simulated crash before delta drop")
      deltaParts.foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_delta_$t"))
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
