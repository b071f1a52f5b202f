package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle on a compact key — the property that keeps them
  * viable at 100 TB:
  *
  *  - exact:   shuffle on a 128-bit content hash (never the content);
  *  - MinHash: shuffle on (band, bandHash) buckets; candidate pairs are
  *             generated per-bucket and verified with true Jaccard, so
  *             the quadratic step only happens inside tiny buckets;
  *  - SimHash: shuffle on 16-bit signature bands; Hamming-verified;
  *  - embedding: delegated to [[Similarity]] LSH buckets with cosine
  *             verification.
  *
  * All hashing uses xxhash64 with per-permutation seeds — codegen'd,
  * no UDFs, deterministic across runs and cluster sizes.
  */
object Dedup {

  /** Exact dedup on a content hash. Returns one row per duplicate group
    * with the kept (minimum) id and the group size. Keys shuffle as
    * 32-char hashes regardless of document size.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"),
           count(lit(1)).as("dup_count"),
           collect_list(col(idCol)).as("member_ids"))

  /** MinHash signature column: k permutations approximated by seeded
    * xxhash64 over word-shingles; minhash_i = min over shingles of
    * h(shingle, i). Pure higher-order functions — stays in codegen.
    */
  def minhashSignature(textCol: Column, k: Int = 64, shingleN: Int = 3): Column = {
    val sh = shingles(textCol, shingleN)
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))
  }

  /** MinHash + LSH candidate pairs above an estimated Jaccard threshold.
    * bands×rowsPerBand must equal k. Two docs land in the same bucket if
    * any band of their signatures matches; candidates are then verified
    * with exact shingle-set Jaccard. The only shuffles are (a) the
    * bucket join on (band, bandHash) and (b) the verification self-join
    * on doc ids.
    */
  def minhashLSH(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                 shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    // Stage the shingle array as a bound column FIRST: expressions inside
    // HOF lambdas are re-evaluated per outer-lambda element (no CSE
    // across lambda bodies), so an un-staged shingles() would re-tokenize
    // the document k times per row — 30× slower at sf0.1.
    // NO corpus-wide cache (r16): the shingle arrays are a
    // doc-length-scaled column — caching them for the whole corpus is
    // O(corpus × doc_len) executor storage (the stored-probe's measured
    // superlinear-wall cause at 8M docs on a fixed heap). The bucket
    // leg needs only the k-long minhash, and its self-join's
    // repartition exchange materializes it once for both sides; the
    // candidate-sized verification leg recomputes its few shingle sets
    // from the source below.
    val sigs = df.select(col(idCol).as("doc_id"),
        array_distinct(graft.functions.expressions.shingles_fast(
          tokens(col(textCol)), shingleN)).as("shingle_set"))
      .select(col("doc_id"),
        graft.functions.expressions.minhash64(col("shingle_set"), k).as("sig"))

    // Buckets carry ONLY (band, hash, id): the shingle arrays would
    // otherwise ride through the bucket-join shuffle. Candidate pairs are
    // few, so fetching their shingle sets afterwards is two cheap
    // id-equi-joins against the cached signature table.
    val buckets = sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(concat_ws(",",
              transform(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)),
                v => v.cast("string"))), b).as("band_hash")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
      // join-key repartition: parallelizes the bucket self-join even when
      // the corpus scan is a single partition (and is the exchange the
      // join would need at scale anyway)
      .repartition(col("band"), col("band_hash"))

    val l = buckets.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
    val r = buckets.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))

    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .persist()

    // Semi-prune the SOURCE to candidate ids BEFORE recomputing any
    // shingle set. The id set is candidate-sized (small by
    // construction), so broadcasting it makes the prune map-side, and
    // the doc-length-scaled shingle arrays are only ever computed for
    // ~candidate-count docs — the full corpus's sets never materialize
    // anywhere (see the sigs comment above). The pruned table is
    // persisted so BOTH side-fetches read it; without that, each
    // equi-join would re-run the prune (and the scan + recompute
    // under it).
    val candIds = candidates.select(col("id_a").as("doc_id"))
      .union(candidates.select(col("id_b").as("doc_id")))
      .distinct()
    val sets = df.select(col(idCol).as("doc_id"), col(textCol))
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_distinct(graft.functions.expressions.shingles_fast(
          tokens(col(textCol)), shingleN)).as("shingle_set"))
      .persist()
    val verified = candidates
      .join(sets.select(col("doc_id").as("id_a"), col("shingle_set").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("shingle_set").as("sh_b")), Seq("id_b"))
      .withColumn("intersection", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union_size",
        size(col("sh_a")) + size(col("sh_b")) - col("intersection"))
      .withColumn("jaccard", col("intersection").cast("double") / col("union_size"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    releaseAfter(Seq(candidates, sets), verified)
  }

  /** Materialize `result` (it's the operator's verified-pair output —
    * small by construction), then drop the big intermediate caches. Without
    * the eager step the unpersist would evict the caches before the lazy
    * plan ever ran; without the unpersist the signature table's cached
    * partitions leak across a long session. The eager step is a
    * `localCheckpoint`, NOT a persist: checkpoint blocks live outside the
    * SQL cache manager and are reclaimed when the frame is dereferenced,
    * so the operator leaves the cache manager EMPTY — no release hook for
    * callers to remember (the r10-flagged lifecycle gap).
    *
    * FAULT-TOLERANCE TRADE-OFF (documented constraint, r11 ADVICE):
    * localCheckpoint blocks are UNREPLICATED and NON-RECOMPUTABLE — on a
    * real cluster a lost executor (or dynamic-allocation scale-down,
    * which Spark's own docs warn is incompatible) fails the job where a
    * persist would recompute. That is acceptable here BY CONSTRUCTION:
    * the checkpointed frame is the operator's small FINAL result, read
    * immediately by the caller — the window between materialization and
    * consumption is one job boundary, and the retry unit on loss is
    * "re-run the operator", the same unit a driver failure already
    * implies. For long-LIVED materializations at cluster scale prefer
    * reliable `checkpoint()` (or persist(MEMORY_AND_DISK_2) with this
    * release discipline) — do NOT blanket-convert operator results back
    * to persist: cache-manager entries dedupe by canonical plan across
    * runs, which is exactly the bench-dishonesty (and cross-query swap)
    * trap r11 removed.
    */
  private def releaseAfter(cached: Seq[DataFrame], result: DataFrame): DataFrame = {
    val out = result.localCheckpoint()
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** SimHash 64-bit signature as staged columns. Single-Column forms of
    * this expression nest the token-hash array inside every per-bit
    * lambda; because HOF lambda bodies get no common-subexpression
    * elimination, that re-hashes the document 64× (and the final bit-fold
    * would square it). Staging hashes → bit-counts → signature as bound
    * attributes evaluates each once per row: O(64·|tokens|) total.
    */
  def withSimhash(df: DataFrame, textCol: String, out: String = "sig"): DataFrame =
    df.withColumn(out, graft.functions.expressions.simhash64(tokens(col(textCol))))

  /** Column form kept for expression composition (small inputs only —
    * see [[withSimhash]] for the staged scale path). */
  def simhash(textCol: Column): Column = {
    val hashes = transform(tokens(textCol), t => xxhash64(t))
    val counts = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, i) => acc.bitwiseOR(call_function("shiftleft",
        when(call_function("element_at", counts, i + lit(1)) > 0, lit(1L)).otherwise(lit(0L)), i)))
  }

  /** SimHash near-dup pairs: band LSH over the 64-bit signature, then
    * Hamming-distance verification via bit_count(xor). `bands` is the
    * recall/candidate-volume knob: a pair collides iff ONE 64/bands-bit
    * chunk matches exactly, so more, narrower bands catch pairs whose
    * differing bits are spread out (8×8 catches ~hamming-7 pairs that
    * 4×16 misses) at the cost of more bucket collisions to verify.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame =
    hammingPairs64(
      withSimhash(df.select(col(idCol).as("doc_id"), col(textCol)), textCol)
        .select(col("doc_id"), col("sig")),
      maxHamming, bands)

  /** [[simhashPairs]]' lazy plan — (cached signature table, UNMATERIALIZED
    * pair frame). For callers that verify candidates further (q21's
    * exact-Jaccard stage): composing lazily fuses band join → hamming
    * prune → fetch → verify into ONE job, skipping the materialization
    * of the (possibly millions-row) intermediate pair set entirely.
    * Callers own the signature cache release after THEIR final
    * materialization.
    */
  private[graft] def simhashPairsPlan(df: DataFrame, idCol: String,
      textCol: String, maxHamming: Int, bands: Int,
      width: Option[Int] = None): (DataFrame, DataFrame) =
    hammingPairs64Plan(
      withSimhash(df.select(col(idCol).as("doc_id"), col(textCol)), textCol)
        .select(col("doc_id"), col("sig")),
      maxHamming, bands, width)

  /** Signature-GENERIC band-LSH Hamming pairing over any 64-bit
    * fingerprint frame (doc_id, sig) — the engine under
    * [[simhashPairs]], reused verbatim by perceptual-hash image dedup
    * ([[Multimodal.imageDupPairs]]). Same contract: a pair collides
    * iff one 64/bands-bit chunk matches exactly; recall is exactly 1
    * for hamming ≤ bands − 1 matched chunks condition (pigeonhole when
    * maxHamming < bands).
    */
  def hammingPairs64(sigs0: DataFrame, maxHamming: Int = 3,
                     bands: Int = 4): DataFrame = {
    val (sigs, verified) = hammingPairs64Plan(sigs0, maxHamming, bands)
    releaseAfter(Seq(sigs), verified)
  }

  /** [[hammingPairs64]]'s lazy plan (see [[simhashPairsPlan]]) —
    * (cached signatures, unmaterialized verified pairs).
    *
    * `width` (r17): an EXPLICIT partition count for the band-join
    * exchange. The keyless-count `repartition(cols)` lets AQE size the
    * exchange by its bytes, and band/signature bytes are tiny relative
    * to the join's expression work (hamming prune + first-matching-band
    * arithmetic over near-all-pairs collisions, plus whatever the
    * caller fuses downstream — q21's whole sorted-Jaccard verify ran as
    * ONE AQE-coalesced task, 2.2 s serial at sf0.1). Callers that know
    * the work is expression-bound pass a data-derived width (the
    * textWidth rule); None keeps byte-based AQE sizing.
    */
  private[graft] def hammingPairs64Plan(sigs0: DataFrame, maxHamming: Int,
      bands: Int, width: Option[Int] = None): (DataFrame, DataFrame) = {
    require(64 % bands == 0, "bands must divide 64")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val sigs = sigs0.select(col("doc_id"), col("sig")).cache()
    // Repartition by the join key: a small corpus read as one partition
    // would otherwise evaluate the (potentially near-all-pairs) band
    // join single-threaded — and at scale this is exactly the exchange
    // the self-join needs, so it costs nothing extra.
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          call_function("shiftright", col("sig"), b * lit(bandBits)).bitwiseAND(mask).as("band_val")))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.band_val"))
    val repartitioned = width match {
      case Some(n) => banded.repartition(n, col("band"), col("band_val"))
      case None => banded.repartition(col("band"), col("band_val"))
    }
    val l = repartitioned.select(col("band"), col("band_val"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = repartitioned.select(col("band"), col("band_val"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    // A pair colliding in several bands would emit several rows; instead
    // of a dropDuplicates SHUFFLE over the (near-all-pairs on correlated
    // signatures) join output, keep each pair only in its FIRST matching
    // band — computable from the two signatures right in the join filter,
    // codegen'd, zero extra exchange. The hamming prune runs in the same
    // stream. Pigeonhole: maxHamming < bands ⇒ some band is untouched ⇒
    // candidate recall for qualifying pairs is exactly 1; wider hamming
    // budgets keep whatever the bands caught (empirically total on the
    // test corpora up to hamming 12).
    val x = col("sig_a").bitwiseXOR(col("sig_b"))
    val firstMatchingBand = (0 until bands).foldRight(lit(-1): Column) { (b, els) =>
      when(call_function("shiftright", x, lit(b * bandBits)).bitwiseAND(mask) === 0L, lit(b))
        .otherwise(els)
    }
    val verified = l.join(r, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("band") === firstMatchingBand)
      .withColumn("hamming", bit_count(x))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
    (sigs, verified)
  }

  /** Multi-block SimHash banding (the combination scheme behind Manku's
    * permuted-table near-dup detection, WWW'07): split the 64-bit
    * signature into `blocks` equal blocks and make one table per
    * `keyBlocks`-subset, keyed on the CONCATENATION of those blocks.
    *
    * Guarantee (pigeonhole): a pair within hamming h touches at most h
    * blocks, so when h ≤ blocks − keyBlocks some keyBlocks-subset is
    * untouched and the pair collides in that table — candidate recall
    * is exactly 1 for h ≤ blocks − keyBlocks. Versus [[simhashPairs]]
    * (the keyBlocks=1 special case), larger keys are far more
    * selective: blocks=8, keyBlocks=2 gives 16-bit keys (×256 fewer
    * random collisions) and still GUARANTEES hamming ≤ 6, at C(8,2)=28
    * tables instead of 8 — the precision/recall knob Manku's scheme
    * adds, as one explode + one bucketed self-join.
    *
    * Per-pair dedup uses the same zero-exchange trick as
    * [[simhashPairs]]: keep a pair only in its FIRST matching table,
    * computed from the two signatures inside the join filter.
    */
  def simhashPairsMultiBlock(df: DataFrame, idCol: String, textCol: String,
                             blocks: Int = 8, keyBlocks: Int = 2,
                             maxHamming: Int = -1): DataFrame = {
    require(64 % blocks == 0, "blocks must divide 64")
    require(keyBlocks >= 1 && keyBlocks < blocks, "1 <= keyBlocks < blocks")
    val budget = if (maxHamming >= 0) maxHamming else blocks - keyBlocks
    val blockBits = 64 / blocks
    val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1
    val subsets = (0 until blocks).combinations(keyBlocks).map(_.toArray).toArray

    val sigs = withSimhash(df.select(col(idCol).as("doc_id"), col(textCol)), textCol)
      .select(col("doc_id"), col("sig")).cache()

    def blockVal(sig: Column, b: Int): Column =
      call_function("shiftright", sig, lit(b * blockBits)).bitwiseAND(mask)
    // key of table t = the t'th subset's blocks packed side by side
    def tableKey(sig: Column, t: Int): Column =
      subsets(t).zipWithIndex.map { case (b, i) =>
        call_function("shiftleft", blockVal(sig, b), lit(i * blockBits))
      }.reduce((a, b) => a.bitwiseOR(b))

    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(array(subsets.indices.map(t =>
          struct(lit(t).as("tbl"), tableKey(col("sig"), t).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.tbl"), col("bk.key"))
      .repartition(col("tbl"), col("key"))

    val l = banded.select(col("tbl"), col("key"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("tbl"), col("key"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val x = col("sig_a").bitwiseXOR(col("sig_b"))
    def subsetUntouched(t: Int): Column =
      subsets(t).map(b => blockVal(x, b) === 0L).reduce(_ && _)
    val firstMatchingTable = subsets.indices.foldRight(lit(-1): Column) { (t, els) =>
      when(subsetUntouched(t), lit(t)).otherwise(els)
    }
    val verified = l.join(r, Seq("tbl", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("tbl") === firstMatchingTable)
      .withColumn("hamming", bit_count(x))
      .filter(col("hamming") <= budget)
      .select(col("id_a"), col("id_b"), col("hamming"))
    releaseAfter(Seq(sigs), verified)
  }

  /** Partial-overlap dedup via rolling-hash content-defined chunking:
    * documents sharing ANY chunk fingerprint are candidate partial
    * duplicates (copy-paste segments invisible to whole-doc hashing).
    * Shuffle key is the chunk fingerprint (8 bytes), never text.
    * `neutralBoundary` selects the md5-prefix boundary rule a SQL
    * oracle replays exactly (see [[graft.functions.RollingChunks]]) —
    * the certified q32 path; default is the XXH64 scale path.
    */
  def chunkDupPairs(df: DataFrame, idCol: String, textCol: String,
                    window: Int = 8, modulus: Int = 16,
                    minSharedChunks: Int = 1,
                    neutralBoundary: Boolean = false): DataFrame = {
    val chunks = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.expressions.rolling_chunks(
          tokens(col(textCol)), window, modulus, neutralBoundary)).as("chunk_fp"))
    val l = chunks.select(col("chunk_fp"), col("doc_id").as("id_a"))
    val r = chunks.select(col("chunk_fp"), col("doc_id").as("id_b"))
    l.join(r, Seq("chunk_fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("chunk_fp")).as("shared_chunks"))
      .filter(col("shared_chunks") >= minSharedChunks)
  }

  /** n-gram Jaccard similarity for an explicit pair set (exact verify
    * used standalone): returns pairwise Jaccard over word n-gram sets.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                   threshold: Double = 0.3): DataFrame = {
    val sets = df.select(col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), n)).as("ngrams"))
    val l = sets.select(col("doc_id").as("id_a"), col("ngrams").as("ng_a"))
    val r = sets.select(col("doc_id").as("id_b"), col("ngrams").as("ng_b"))
    // NB: quadratic — only for small candidate sets; large-scale paths
    // go through minhashLSH which prunes before this computation.
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("intersection", size(array_intersect(col("ng_a"), col("ng_b"))))
      .withColumn("union_size", size(col("ng_a")) + size(col("ng_b")) - col("intersection"))
      .withColumn("jaccard", col("intersection").cast("double") / col("union_size"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
