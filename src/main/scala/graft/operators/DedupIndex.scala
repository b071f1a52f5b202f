package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BloomRef
import graft.functions.TextFunctions.tokens
import graft.functions.expressions.{bloom_contains_long, hashed_set, minhash64, shingles_fast, sorted_jaccard}

/** Incremental dedup against a STORED corpus — the operational shape of
  * near-dedup at 100 TB. A pipeline doesn't re-LSH its whole corpus for
  * every new crawl dump; it stores the corpus's LSH state once and
  * checks each incoming batch against it:
  *
  *  - `saveCorpus` persists two tables: the (band, band_hash, doc_id)
  *    bucket table and a (doc_id, hset) sorted-hash shingle-set table
  *    BUCKETED BY doc_id.
  *  - `dedupAgainstStored` computes the new batch's buckets (the batch
  *    is the small side by construction), BROADCASTS them against the
  *    stored bucket table — the 100 TB corpus side is scanned linearly
  *    but never shuffled — and verifies candidates with exact Jaccard,
  *    fetching only the matched corpus docs' shingle sets through the
  *    bucketed doc_id join (no exchange on the stored side there
  *    either: the bucketing IS the partitioning the join needs).
  *  - `admitAgainstStored` is the filter a pipeline actually applies:
  *    the new batch minus anything duplicating the stored corpus
  *    (intra-batch dups are [[Dedup.minhashLSH]]'s job — compose both).
  *  - a bucket-hash Bloom filter (`<table>_bloom`, built distributed at
  *    save time, MERGED — never rebuilt — at append time) pre-prunes an
  *    incoming batch's buckets before any join touches the stored
  *    table: a definite miss drops the bucket at the batch scan, and a
  *    fully-clean batch (the common case in steady state) prunes to
  *    zero buckets, which AQE's empty-relation propagation turns into
  *    "never scan the stored corpus at all". False positives only cost
  *    a redundant candidate check — the exact-Jaccard verify stage is
  *    unchanged.
  *
  * Same signature scheme as [[Dedup.minhashLSH]] (seeded xxhash64
  * MinHash over word shingles), so a batch admitted today and appended
  * to the stored tables is checked against tomorrow with no rebuild.
  * Jaccard here runs over sorted 64-bit shingle hashes
  * ([[graft.functions.SortedJaccard]]): linear merge per candidate,
  * and the stored set rows are compact longs, not shingle text.
  *
  * (Like [[IvfIndex.saveIndex]], tables go through the session
  * catalog: with the default in-memory catalog the registration lives
  * for the session; point the session at a persistent metastore for
  * cross-session reuse — files and layout are identical either way.)
  */
object DedupIndex {

  /** The bucketing leg's frame: doc_id + the k-long minhash ONLY. The
    * full hashed shingle set (`hset`, ~one long per distinct shingle —
    * a doc-length-scaled column) must never ride a batch-wide
    * persist/cache: at 8M docs it is ~13 GB of executor storage, the
    * measured cause of the probe's superlinear wall past 4M on a fixed
    * heap (r16 drain scale-law runs). Legs that need `hset` recompute
    * it per-consumer instead ([[hashedSets]]) — candidate-sized where
    * possible, one extra streaming pass where not.
    */
  private def sigOnly(df: DataFrame, idCol: String, textCol: String,
                      k: Int, shingleN: Int): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      minhash64(array_distinct(shingles_fast(tokens(col(textCol)), shingleN)),
        k).as("sig"))

  /** The verification/storage leg's frame: doc_id + the full hashed
    * shingle set, computed in a single streaming pass — pair of
    * [[sigOnly]]; see its scaladoc for why the two are never combined
    * under one persist.
    *
    * DETERMINISM CONTRACT: the split means a probe/save/append
    * evaluates its input frame once per leg instead of reading one
    * persisted copy — a NONDETERMINISTIC input (sampling, rand,
    * re-read of a mutating source) could hand the two legs different
    * rows, leaving bucket rows without set rows (silent
    * under-detection). This is the SAME assumption the crash-replay
    * convergence contract already makes (a replay must re-produce the
    * batch bit-identically — appendCorpusImpl's seams, the drain's
    * localCheckpoint inputs); callers with nondeterministic frames
    * must materialize them first, exactly as they already must for
    * replay safety.
    */
  private def hashedSets(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      hashed_set(array_distinct(shingles_fast(tokens(col(textCol)),
        shingleN))).as("hset"))

  /** Explode a signature frame into its LSH buckets: (band, band_hash,
    * doc_id) — identical banding arithmetic to [[Dedup.minhashLSH]].
    */
  private def buckets(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(concat_ws(",",
              transform(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)),
                v => v.cast("string"))), b).as("band_hash")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
  }

  /** Persist a corpus's LSH state: `<table>_buckets` (band, band_hash,
    * doc_id, batch_id) and `<table>_sets` (doc_id, hset, batch_id)
    * bucketed by doc_id so the verification fetch join needs no
    * exchange on the stored side. `batch_id` is the ingest provenance
    * stamp the snapshot-by-watermark probe filters on (see
    * [[dedupAgainstStored]]); the base corpus is stamped −1, i.e.
    * "committed before any batch".
    */
  def saveCorpus(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
                 table: String, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                 setBuckets: Int = 32, bloomItems: Long = 1L << 22,
                 bloomFpp: Double = 0.01): Unit = {
    require(k % bands == 0, "bands must divide k")
    // bucket rows (3 longs/doc/band) persist for their two consumers
    // (table write + Bloom build); the hset frame streams straight
    // into its single write — nothing doc-length-scaled persists
    // (see sigOnly's scaladoc)
    val bk = buckets(sigOnly(df, idCol, textCol, k, shingleN), k, bands).persist()
    bk.withColumn("batch_id", lit(-1L))
      .withColumn("writer_id", lit(null).cast("string"))
      .write.mode("overwrite").saveAsTable(s"${table}_buckets")
    // capacity floors at the ACTUAL initial row count (a base corpus
    // larger than the default would otherwise start saturated — the
    // r17 16M-drain finding; see appendUnderLease's overflow rebuild)
    val rows = bk.count()
    val cap = math.max(bloomItems, rows * 2)
    writeBloom(spark, table,
      bk.stat.bloomFilter("band_hash", cap, bloomFpp), cap, bloomFpp, rows)
    bk.unpersist(blocking = false)
    hashedSets(df, idCol, textCol, shingleN)
      .select(col("doc_id"), col("hset"), lit(-1L).as("batch_id"),
        lit(null).cast("string").as("writer_id"))
      .write.mode("overwrite")
      .bucketBy(setBuckets, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${table}_sets")
  }

  private def writeBloom(spark: SparkSession, table: String,
                         bloom: org.apache.spark.util.sketch.BloomFilter,
                         items: Long, fpp: Double, nInserted: Long): Unit = {
    import spark.implicits._
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Seq((bos.toByteArray, items, fpp, nInserted))
      .toDF("bloom", "items", "fpp", "n_inserted")
      .write.mode("overwrite").saveAsTable(s"${table}_bloom")
  }

  /** Stored Bloom + its build parameters, if the corpus has one (older
    * stored corpora predate the Bloom — everything degrades gracefully
    * to the un-pruned path). A CORRUPT bloom table (a crash mid-
    * overwrite can leave the metastore entry pointing at missing
    * files) also degrades to None instead of wedging every probe and
    * commit on a pure optimization: the exact-Jaccard verify stage
    * never depended on the filter, so results are unchanged — only the
    * prune is lost. Repair with [[rebuildBloom]].
    */
  private def readBloom(spark: SparkSession, table: String)
      : Option[(BloomRef, Long, Double, Long)] =
    if (!spark.catalog.tableExists(s"${table}_bloom")) None
    else
      try spark.table(s"${table}_bloom").collect().headOption.map { r =>
        // legacy blooms (pre-r17) carry no insertion counter: read them
        // as AT CAPACITY so the first append rebuilds with an exact
        // count — one linear scan, then the corpus is self-healed
        val nIns = if (r.schema.fieldNames.contains("n_inserted"))
          r.getAs[Long]("n_inserted") else r.getAs[Long]("items")
        (new BloomRef(r.getAs[Array[Byte]]("bloom")),
          r.getAs[Long]("items"), r.getAs[Double]("fpp"), nIns)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"graft: stored bloom ${table}_bloom unreadable (${e.getClass.getSimpleName}) — " +
              "probes degrade to un-pruned until rebuildBloom runs")
          None
      }

  /** One-time schema upgrade for corpora saved BEFORE the `batch_id`
    * provenance stamp existed: a metadata-only `ALTER TABLE ADD
    * COLUMNS` — old parquet files read the new column as NULL, and
    * every reader folds NULL to −1 ("committed before any batch"), so
    * legacy rows behave exactly like a base corpus. This is the
    * engine's versioned-codec discipline (the reference migrates
    * config shapes in place the same way, `upgrades.js:235–284`;
    * the Ledger read-side-backfills pre-upgrade logs missing
    * `seq`/`deleted`). Idempotent: a table that already carries the
    * column is untouched.
    */
  private def ensureBatchId(spark: SparkSession, t: String): Unit = {
    if (!spark.table(t).columns.contains("batch_id")) {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (batch_id BIGINT)")
      spark.catalog.refreshTable(t)
    }
    // r14 codec extension: `writer_id` records WHO stamped a batch, so
    // a replay check can tell its own batch N from a DIFFERENT job's
    // batch N (checkpoint-derived batch numbering collides across jobs
    // from batch 0). Same metadata-only upgrade; pre-r14 rows read
    // NULL ≡ "stamped by this table's only historical writer" — the
    // single-writer contract those rows were written under.
    if (!spark.table(t).columns.contains("writer_id")) {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (writer_id STRING)")
      spark.catalog.refreshTable(t)
    }
  }

  /** Rebuild a corpus's bucket-hash Bloom from the stored bucket table
    * — the repair for a bloom lost to a crash mid-overwrite (probes
    * degrade gracefully meanwhile, they just stop pruning). One linear
    * scan of `<table>_buckets`; call with the same (items, fpp) the
    * corpus was built with so future appends keep merging compatibly.
    */
  def rebuildBloom(spark: SparkSession, table: String,
                   bloomItems: Long = 1L << 22, bloomFpp: Double = 0.01): Unit = {
    val bk = spark.table(s"${table}_buckets")
    // capacity floors at the actual stored row count, same as saveCorpus
    val rows = bk.count()
    val cap = math.max(bloomItems, rows * 2)
    writeBloom(spark, table,
      bk.stat.bloomFilter("band_hash", cap, bloomFpp), cap, bloomFpp, rows)
    spark.catalog.refreshTable(s"${table}_bloom")
  }

  /** Append an (admitted) batch's LSH state to the stored tables — the
    * other half of the incremental loop: admit today's batch against the
    * corpus, append its state, and tomorrow's batch is checked against
    * both with no rebuild. Bucket rows append plainly; set rows append
    * through the same doc_id bucketBy spec, so the fetch join keeps
    * riding the bucketing over old and new rows alike.
    *
    * `batchId` stamps the appended rows for the snapshot-by-watermark
    * probe ([[dedupAgainstStored]]'s `committedBatch`) AND makes the
    * append REPLAY-CONVERGENT: with `batchId >= 0`, a table that
    * already carries that batch's rows (a crash replay after a partial
    * commit) skips its append instead of duplicating it — per table,
    * so a crash between the buckets and sets writes completes exactly
    * the missing half on retry. The Bloom merge is a set union and
    * re-merges idempotently. `batchId = -1` (default) preserves the
    * plain batch-less append.
    *
    * Stamped rows additionally carry `writer_id = owner` (r14): the
    * replay skip is scoped to THIS writer's own batch numbering, and a
    * stamped append finding the same `batchId` stamped by a DIFFERENT
    * writer fails loudly — two ingest jobs (whose checkpoint-derived
    * batch ids both start at 0) cannot share one corpus table, and
    * no-opping the second job's append would silently drop its
    * admitted docs from all future duplicate detection. Callers that
    * stamp must therefore pass a STABLE `owner` across restarts (the
    * ingest pipeline derives it from its checkpoint dir); pre-r14
    * stamps read NULL writer_id ≡ this table's only historical writer.
    */
  def appendCorpus(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
                   table: String, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                   setBuckets: Int = 32, batchId: Long = -1L,
                   owner: String = WriterLease.jvmOwner): Unit =
    appendCorpusImpl(spark, df, idCol, textCol, table, k, bands, shingleN,
      setBuckets, batchId, owner)

  /** `crashAfterStep` is the test seam (the [[StoredMerge
    * .upsertBucketsImpl]] recipe): throw after step N (1 = buckets
    * appended, 2 = Bloom merged, 3 = sets appended) so the
    * crash-at-every-step replay spec can exercise each window.
    */
  private[graft] def appendCorpusImpl(spark: SparkSession, df: DataFrame,
      idCol: String, textCol: String, table: String, k: Int, bands: Int,
      shingleN: Int, setBuckets: Int, batchId: Long,
      owner: String = WriterLease.jvmOwner,
      crashAfterStep: Int = Int.MaxValue): Unit = {
    require(k % bands == 0, "bands must divide k")
    // single writer, lease-ENFORCED on the corpus's own path (r13
    // self-review): two jobs sharing a dedup table but different
    // offsets paths hold non-conflicting offsets leases yet race the
    // Bloom read-OR-overwrite — a classic lost update that silently
    // degrades admission pruning. The corpus lease SERIALIZES their
    // appends loudly; a pipeline commit re-enters with its own
    // writerId. Serialization alone does NOT make sharing the table
    // safe, though — both jobs number batches from 0, so the second
    // job's batch N would read as "already appended" and silently
    // no-op; the (writer_id, batch_id) provenance check inside
    // appendUnderLease (r14) turns that collision into a loud refusal.
    WriterLease.withLease(spark, WriterLease.tableStatePath(spark, table), owner) {
      appendUnderLease(spark, df, idCol, textCol, table, k, bands, shingleN,
        setBuckets, batchId, owner, crashAfterStep)
    }
  }

  private def appendUnderLease(spark: SparkSession, df: DataFrame,
      idCol: String, textCol: String, table: String, k: Int, bands: Int,
      shingleN: Int, setBuckets: Int, batchId: Long, owner: String,
      crashAfterStep: Int): Unit = {
    // replay safety: the presence checks below must see what is ON DISK,
    // not a pre-crash relation-cache listing (same rule as the exit
    // refresh — stale listings would double-append). A table that does
    // not exist yet is skipped everywhere here — the FIRST append
    // (stamped or not) creates it below with the stamp already in its
    // schema, and an absent table trivially has no prior batch rows.
    if (batchId >= 0L)
      Seq(s"${table}_buckets", s"${table}_sets")
        .filter(spark.catalog.tableExists).foreach(spark.catalog.refreshTable)
    // legacy corpora (saved before the provenance stamps) lack the
    // batch_id / writer_id columns the stamped append writes — upgrade
    // in place (metadata-only; legacy rows read NULL batch_id ≡
    // committed-before-any-batch, NULL writer_id ≡ this writer's own)
    Seq(s"${table}_buckets", s"${table}_sets")
      .filter(spark.catalog.tableExists).foreach(ensureBatchId(spark, _))
    // CROSS-JOB COLLISION REFUSAL (r14, the r13 ADVICE finding): the
    // replay skip below is keyed by (writer, batch) — without the
    // writer dimension, job B's append of ITS batch N silently no-ops
    // against job A's already-committed batch N (both jobs' streaming
    // batch ids start at 0), so B's admitted docs never enter the
    // corpus and their future duplicates are never detected. Two live
    // jobs cannot share one stamped corpus's batch numbering: a
    // foreign writer's stamp on THIS batch id fails loudly (the
    // lease's own refusal contract), instead of no-opping. NULL
    // writer_id rows (pre-r14 stamps) belong to the table's only
    // historical writer and skip as before.
    //
    // ONE limit-1 probe per table decides all three outcomes on the
    // COMMON paths (r15, the r14 ADVICE efficiency finding — the
    // refusal and the replay skip each used to scan the table,
    // O(corpus) twice per micro-batch): absent → append (the healthy
    // steady state pays exactly one empty probe), present stamped
    // FOREIGN → refuse. A probed row reading own/NULL is a SUSPECTED
    // replay — only then does the full foreign-row scan run (r15
    // ADVICE): the limit-1 row is arbitrary, and if a batch ever
    // carried mixed stamps (a pre-r15 concurrent-append race on the
    // non-atomic file-backend lease, historical misuse), classifying
    // by one sampled row would turn the refusal nondeterministic —
    // the scan keeps it loud, and its O(corpus) cost is paid only on
    // actual replays (rare: one per crash recovery).
    val stamp: Map[String, Option[Option[String]]] =
      Seq(s"${table}_buckets", s"${table}_sets").map { t =>
        t -> (if (batchId < 0L || !spark.catalog.tableExists(t)) None
              else spark.table(t).filter(col("batch_id") === batchId)
                .select(col("writer_id")).limit(1)
                .collect().headOption.map(r => Option(r.getString(0))))
      }.toMap
    def refuseForeign(t: String, foreign: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"corpus $t already carries batch $batchId stamped by a " +
          s"DIFFERENT writer ($foreign, this job is $owner): " +
          "two ingest jobs cannot share one dedup corpus's batch " +
          "numbering — point each job at its own corpus table, or " +
          "run one job")
    stamp.foreach { case (t, probed) =>
      probed.foreach {
        case Some(foreign) if foreign != owner => refuseForeign(t, foreign)
        case _ => // own/NULL sample: confirm NO foreign row hides behind it
          spark.table(t).filter(col("batch_id") === batchId &&
              col("writer_id").isNotNull && col("writer_id") =!= owner)
            .select(col("writer_id")).limit(1)
            .collect().headOption.foreach(r => refuseForeign(t, r.getString(0)))
      }
    }
    def alreadyAppended(t: String): Boolean = stamp(t).isDefined
    // bucket rows persist for their two consumers (append + Bloom
    // merge); the hset frame streams straight into the sets append —
    // nothing doc-length-scaled persists (see sigOnly's scaladoc)
    val bk = buckets(sigOnly(df, idCol, textCol, k, shingleN), k, bands).persist()
    if (!alreadyAppended(s"${table}_buckets"))
      bk.withColumn("batch_id", lit(batchId))
        .withColumn("writer_id",
          if (batchId >= 0L) lit(owner) else lit(null).cast("string"))
        .write.mode("append").saveAsTable(s"${table}_buckets")
    if (crashAfterStep <= 1)
      throw new IllegalStateException("simulated crash after corpus buckets append")
    // merge the batch's Bloom into the stored one (same build params ⇒
    // compatible bit arrays) — an O(filter bytes) driver op, no rebuild,
    // and idempotent under replay (re-ORing the same bits is a no-op).
    // EMPTY-batch guard: stat.bloomFilter over zero rows yields a NULL
    // buffer that BloomFilter.readFrom NPEs on — an all-dropped
    // micro-batch (steady-state replays) must be a no-op append, not a
    // crash (found by the composed-ingest parity spec's first batch).
    //
    // SATURATION (r17, found by the 16M drain): a fixed-capacity filter
    // absorbing unbounded corpus growth silently degrades to FPP ≈ 1 —
    // the prune stops pruning and every probe's broadcast(newBuckets)
    // reverts to batch scale (~0.5 GB silently at 8M docs, a hard
    // maxResultSize abort at 16M). The stored metadata now counts
    // insertions (batch ROW counts — an upper bound on distinct hashes,
    // so overflow only ever fires early; a crash-replay's re-merge may
    // double-count a batch, which again only hastens the rebuild); on
    // overflow the filter is REBUILT from the stored bucket table at
    // ≥2× capacity — one linear corpus scan per doubling, amortized
    // O(1)/doc, and bit-exact probe results either way (the filter is
    // false-positive-only; the exact-Jaccard verify never depended on
    // it).
    readBloom(spark, table).foreach { case (ref, items, fpp, nIns) =>
      if (!bk.isEmpty) {
        val add = bk.count()
        if (nIns + add <= items) {
          val merged = ref.filter.mergeInPlace(
            bk.stat.bloomFilter("band_hash", items, fpp))
          writeBloom(spark, table, merged, items, fpp, nIns + add)
        } else {
          // the rebuilt filter must be a SUPERSET of every stored hash
          // (false negatives would prune true duplicates): refresh so
          // the scan sees the rows appended above even when they were
          // written through a foreachBatch clone session, and merge the
          // batch's own filter in explicitly as belt-and-braces
          spark.catalog.refreshTable(s"${table}_buckets")
          val stored = spark.table(s"${table}_buckets")
          val rows = stored.count()
          val cap = math.max(items * 2, rows * 2)
          val rebuilt = stored.stat.bloomFilter("band_hash", cap, fpp)
            .mergeInPlace(bk.stat.bloomFilter("band_hash", cap, fpp))
          writeBloom(spark, table, rebuilt, cap, fpp, rows)
        }
      }
    }
    if (crashAfterStep <= 2)
      throw new IllegalStateException("simulated crash after corpus bloom merge")
    bk.unpersist(blocking = false)
    if (!alreadyAppended(s"${table}_sets"))
      hashedSets(df, idCol, textCol, shingleN)
        .select(col("doc_id"), col("hset"), lit(batchId).as("batch_id"),
          (if (batchId >= 0L) lit(owner)
           else lit(null).cast("string")).as("writer_id"))
        .write.mode("append")
        .bucketBy(setBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(s"${table}_sets")
    if (crashAfterStep <= 3)
      throw new IllegalStateException("simulated crash after corpus sets append")
    // MIXED-SESSION CORRECTNESS: the appends above run through the
    // INPUT frame's session — under foreachBatch that is the
    // micro-batch CLONE, and a write invalidates only the writing
    // session's relation cache. Without an explicit refresh the
    // caller's `spark` serves the stale pre-append file listing
    // indefinitely (found by the composed-ingest parity spec: admitted
    // docs were on disk but invisible to the next probe).
    Seq(s"${table}_buckets", s"${table}_sets")
      .foreach(spark.catalog.refreshTable)
  }

  /** A batch's LSH buckets under the corpus's signature scheme — the
    * exact rows [[dedupAgainstStored]] probes with (public so specs and
    * prune-rate monitoring see the same arithmetic).
    */
  def batchBuckets(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, bands: Int = 8, shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    buckets(sigOnly(df, idCol, textCol, k, shingleN), k, bands)
  }

  /** Prune a batch's buckets to those whose band_hash might exist in
    * the stored corpus (public so specs and pipelines can observe the
    * prune rate). Identity when no Bloom is stored.
    */
  def bloomPrune(spark: SparkSession, table: String, newBuckets: DataFrame): DataFrame =
    readBloom(spark, table) match {
      case Some((ref, _, _, _)) => newBuckets.filter(bloom_contains_long(col("band_hash"), ref))
      case None                 => newBuckets
    }

  /** Near-duplicate pairs (new_id, corpus_id, jaccard) between an
    * incoming batch and the stored corpus. The stored tables are
    * scanned, never shuffled: the batch's buckets broadcast into the
    * candidate join, and the set fetch rides the stored table's
    * doc_id bucketing.
    *
    * ID-COLLISION CONTRACT, scoped by the watermark: on an
    * UNWATERMARKED probe (`committedBatch = Long.MaxValue`, the ad-hoc
    * batch path where the caller may have just appended the very rows
    * it probes with), a batch doc sharing its id with a corpus doc is
    * never reported as its own duplicate (`new_id =!= corpus_id` at
    * the candidate stage) — re-submitting a known id there is
    * indistinguishable from probing one's own append. On a WATERMARKED
    * probe (the ingest discipline), the exclusion is OFF: the snapshot
    * already hides the probe's own uncommitted append, so any same-id
    * corpus row still visible was committed by an EARLIER batch — a
    * genuine resubmission, which must gate as a stored duplicate
    * rather than re-admit and double-append its id. Either way a
    * colliding id's matches against OTHER corpus docs still report.
    *
    * `committedBatch` is the snapshot-by-watermark bound: only corpus
    * rows stamped `batch_id <= committedBatch` are probed (a pushed
    * scan predicate — bucketing intact), so a foreachBatch replay that
    * runs against a HALF-COMMITTED corpus (its own crashed append
    * already on disk, the offsets high-water not yet advanced) sees
    * exactly the pre-batch corpus and reproduces the original labels
    * bit-for-bit. Default `Long.MaxValue` probes everything.
    */
  def dedupAgainstStored(spark: SparkSession, table: String, newDocs: DataFrame,
                         idCol: String, textCol: String, threshold: Double = 0.5,
                         k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                         committedBatch: Long = Long.MaxValue): DataFrame = {
    val (_, lazyOut) = dedupAgainstStoredPlan(spark, table, newDocs,
      idCol, textCol, threshold, k, bands, shingleN, committedBatch)
    // eager localCheckpoint, not persist+count: the pair output is
    // small by construction and checkpoint blocks stay OUT of the
    // SQL cache manager (the Dedup.releaseAfter discipline); the
    // signature frame is lazy and un-persisted (see sigOnly) —
    // nothing to release.
    lazyOut.localCheckpoint()
  }

  /** [[dedupAgainstStored]]'s lazy plan, pre-materialization —
    * (new-batch minhash signatures, verified dup pairs). Split out so
    * specs can inspect the stored-side join shape (the shipped wrapper
    * reads back the checkpointed LogicalRDD).
    */
  private[graft] def dedupAgainstStoredPlan(spark: SparkSession, table: String,
      newDocs: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int, bands: Int, shingleN: Int,
      committedBatch: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    require(k % bands == 0, "bands must divide k")
    // the watermark snapshot: a pushed batch_id predicate on both
    // stored scans — partition/bucket layout untouched, uncommitted
    // (crash-orphaned) rows invisible. Legacy codec: a corpus saved
    // before the provenance stamp either lacks the column entirely
    // (skip the filter — every row predates every batch) or carries
    // NULL on pre-upgrade rows (IS NULL ≡ −1, committed; both
    // disjuncts translate to pushed parquet filters).
    def snapshot(t: String): DataFrame = {
      val full = spark.table(t)
      if (committedBatch == Long.MaxValue || !full.columns.contains("batch_id")) full
      else full.filter(col("batch_id").isNull ||
        col("batch_id") <= committedBatch)
    }
    // the batch side carries ONLY its minhash signature (k longs/doc)
    // through the bucketing leg — NOT the full hashed shingle set
    // (~one long per token, a ~1.6 KB/doc frame the pre-r16 shape
    // persisted batch-wide: ~13 GB of executor storage at 8M docs,
    // the measured source of the probe's superlinear wall past 4M on
    // a fixed heap). The shingle sets are recomputed below for the
    // candidate-sized remainder only; nothing batch-scaled persists.
    val newSigs = sigOnly(newDocs, idCol, textCol, k, shingleN)
    val newBuckets = bloomPrune(spark, table,
      buckets(newSigs, k, bands).withColumnRenamed("doc_id", "new_id"))

    val matched = snapshot(s"${table}_buckets")
      .join(broadcast(newBuckets), Seq("band", "band_hash"))
      .select(col("new_id"), col("doc_id").as("corpus_id"))
    // the id-collision contract (see dedupAgainstStored's scaladoc):
    // self-pair exclusion applies ONLY to unwatermarked probes — under
    // a watermark, a visible same-id row is an earlier batch's commit,
    // so its re-arrival is a genuine stored duplicate.
    // Eager candidate-sized checkpoint: three consumers below each
    // broadcast this frame — without it, every broadcast would re-run
    // the batch-wide signature pipeline (checkpoint blocks stay out of
    // the SQL cache manager, the releaseAfter discipline).
    val candidates = (if (committedBatch == Long.MaxValue)
        matched.filter(col("new_id") =!= col("corpus_id"))
      else matched)
      .dropDuplicates("new_id", "corpus_id")
      .localCheckpoint()

    // fetch ONLY matched corpus docs' sets; candidate ids are small by
    // construction (LSH matches: dup rate + banding false positives),
    // so the semi-prune is map-side and the equi-join uses the stored
    // bucketing instead of an exchange
    val corpusSets = snapshot(s"${table}_sets")
      .join(broadcast(candidates.select(col("corpus_id").as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
    // verification joins: EVERY broadcast hint here rides a
    // candidate-sized frame, NEVER the batch side (r16, found by the
    // 8M drain): the pre-r16 shape hinted broadcast(newSigs) — the
    // whole batch's signature arrays — which Spark obeys regardless of
    // size, collecting a batch-SCALED frame to the driver every
    // micro-batch (streaming plans run without AQE): a silent
    // ~0.5 GB driver roundtrip per 2M-doc batch, a hard
    // maxResultSize abort at 8M. Shape now: candidates broadcast into
    // the bucketed corpus-sets scan (stored side still exchange-free,
    // spec-pinned); the verification leg re-scans the batch input,
    // broadcast-semi-prunes it to the candidate docs, and only THEN
    // recomputes their hashed shingle sets — the batch side never
    // exchanges, broadcasts, or persists, so the probe's memory
    // footprint scales with the dup rate, not the batch.
    val verified = corpusSets
      .select(col("doc_id").as("corpus_id"), col("hset").as("h_c"))
      .join(broadcast(candidates), Seq("corpus_id"))
    val candSets = hashedSets(
      newDocs.select(col(idCol).cast("long").as(idCol), col(textCol))
        .join(broadcast(candidates.select(col("new_id").as(idCol)).distinct()),
          Seq(idCol), "left_semi"),
      idCol, textCol, shingleN)
      .withColumnRenamed("doc_id", "new_id")
      .withColumnRenamed("hset", "h_n")
    val out = candSets
      .join(broadcast(verified), Seq("new_id"))
      .withColumn("jaccard", sorted_jaccard(col("h_n"), col("h_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
    (newSigs, out)
  }

  /** The admission filter: the new batch minus documents that duplicate
    * the stored corpus at `threshold`.
    */
  def admitAgainstStored(spark: SparkSession, table: String, newDocs: DataFrame,
                         idCol: String, textCol: String, threshold: Double = 0.5,
                         k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                         committedBatch: Long = Long.MaxValue): DataFrame = {
    val dups = dedupAgainstStored(spark, table, newDocs, idCol, textCol,
      threshold, k, bands, shingleN, committedBatch)
    newDocs.join(dups.select(col("new_id")).distinct(),
      newDocs(idCol).cast("long") === col("new_id"), "left_anti")
  }
}
