package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): near-duplicate
  * detection in EMBEDDING space — documents whose vectors sit within a
  * cosine threshold are semantic copies even when their surface text
  * shares no n-grams, so MinHash/SimHash misses them.
  *
  * The scale path reuses the IVF coarse quantizer
  * ([[IvfIndex.build]]'s sampled spherical k-means): every vector is
  * multi-assigned to its `nassign` nearest cells, candidate pairs come
  * from a self-join WITHIN cells only, and exact cosine verifies. With
  * balanced cells the pair volume drops from n²/2 to
  * Σ_cells (cell_size²/2) ≈ n²·nassign²/(2·nlist) — the SemDeDup paper's
  * own construction. Keep-min survivorship composes through
  * [[Clusters.dedupClusters]] exactly like the text dedup family.
  *
  * 100 TB design: the only corpus-sized shuffle is the self-join's
  * hash-partition on `cell` (and the centroid routing is a broadcast
  * reference object, not a join). Cell-size skew — oversized cells
  * going quadratic on ONE reducer — is GUARDED, not just documented:
  * cells above `maxCellSize` are split into g = ⌈size/maxCellSize⌉
  * deterministic sub-groups and the self-join runs per block-pair
  * (bi ≤ bj) on the key (cell, bi, bj), so per-task input is bounded
  * by ~2·maxCellSize however saturated a cell gets (the m²/2 candidate
  * VOLUME is inherent to the algorithm, but it spreads over g(g+1)/2
  * tasks instead of one). Cold cells take g = 1 — bit-identical to the
  * plain cell join, zero replication. `nlist` should still grow with n
  * (the paper uses √n-ish); the guard is the backstop for the cells
  * k-means leaves dense anyway.
  */
object SemDedup {

  /** The two sides of the blocked per-cell self-join (see object doc):
    * every row lands in sub-group `sub` = xxhash64(id) mod g; the A
    * side replicates to block-pairs (sub, j ≥ sub), the B side to
    * (i ≤ sub, sub), so each unordered pair meets in exactly the block
    * (min(g_u,g_v), max(g_u,g_v)) — same-group pairs twice, (u,v) and
    * (v,u), canonicalized downstream. Exposed for the skew spec, which
    * asserts the per-(cell,bi,bj) group-size bound directly.
    */
  private[graft] def blockedSides(assigned: DataFrame,
                                  maxCellSize: Int): (DataFrame, DataFrame) = {
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("cell_n"))
    val sub = assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("g",
        ceil(col("cell_n") / lit(maxCellSize.toDouble)).cast("int"))
      .withColumn("sub", pmod(xxhash64(col("corpus_id")), col("g")).cast("int"))
    val a = sub.select(col("cell"), col("sub").as("bi"),
      explode(sequence(col("sub"), col("g") - 1)).as("bj"),
      col("corpus_id").as("id_a"), col("cvec").as("vec_a"))
    val b = sub.select(col("cell"),
      explode(sequence(lit(0), col("sub"))).as("bi"),
      col("sub").as("bj"),
      col("corpus_id").as("id_b"), col("cvec").as("vec_b"))
    (a, b)
  }

  /** Candidate-verified semantic duplicate pairs: (id_a, id_b, cosine)
    * with cosine ≥ `threshold`, found via shared IVF cells through the
    * skew-guarded blocked self-join (per-task input ≤ ~2·maxCellSize
    * even with one saturated cell — see object doc).
    */
  def semanticDupPairs(spark: SparkSession, emb: DataFrame,
                       idCol: String, vecCol: String,
                       threshold: Double = 0.95, nlist: Int = 16,
                       nassign: Int = 2, seed: Long = 42L,
                       maxCellSize: Int = 1000000): DataFrame = {
    val index = IvfIndex.build(spark, emb, idCol, vecCol,
      nlist = nlist, seed = seed, nassign = nassign)
    val (a, b) = blockedSides(index.assigned, maxCellSize)
    a.join(b, Seq("cell", "bi", "bj"))
      .filter(col("id_a") =!= col("id_b"))
      // canonicalize BEFORE dedup: a cross-group pair appears only in
      // its (min,max) block, whose orientation need not follow id order
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("vec_a"), col("vec_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact all-pairs baseline (verification only — quadratic by
    * construction, never the shipped path).
    */
  def exactDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Survivorship: one kept vector per semantic-duplicate component. */
  def keep(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
           threshold: Double = 0.95, nlist: Int = 16, nassign: Int = 2): DataFrame = {
    val pairs = semanticDupPairs(spark, emb, idCol, vecCol, threshold, nlist, nassign)
    Clusters.dedupClusters(emb, idCol, pairs.select(col("id_a"), col("id_b")))
  }

  // -------------------------------------------------------------------
  // Incremental form against a STORED index — the operational shape
  // (the embedding mirror of [[DedupIndex]]): persist the corpus's IVF
  // state once ([[IvfIndex.saveIndex]]), then check each incoming batch
  // against it and append what survives ([[IvfIndex.appendToStored]]).
  // The stored corpus is bucket-pruned and scanned, never shuffled: the
  // batch routes through the STORED centroids (broadcast reference
  // object), its (cell, vec) rows broadcast into the candidate join,
  // and `cell IN (...)` is a literal predicate the bucketed scan prunes
  // on.
  // -------------------------------------------------------------------

  /** Semantic-duplicate pairs (new_id, corpus_id, cosine) between an
    * incoming batch and a stored IVF index.
    */
  def semanticDupAgainstStored(spark: SparkSession, table: String, newVecs: DataFrame,
                               idCol: String, vecCol: String,
                               threshold: Double = 0.95, nprobe: Int = 2): DataFrame = {
    val centroidMatrix = IvfIndex.loadCentroids(spark, table)
    // the cell list for the scan's bucket prune needs ONLY the 4-byte
    // cell column — computed as its own pass so the batch's vectors
    // are never persisted batch-wide (the r16 dedup-family law:
    // nothing batch-scaled lives in executor storage; the routing
    // recompute is one dims×nlist pass read straight off the source)
    val probe0 = newVecs.select(col(idCol).as("new_id"), col(vecCol).as("nvec"))
    val probed = probe0.withColumn("cell",
      explode(graft.functions.expressions.nearest_cells(col("nvec"), centroidMatrix, nprobe)))
    val cells = probe0
      .select(explode(graft.functions.expressions.nearest_cells(
        col("nvec"), centroidMatrix, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0))
    val corpus = spark.table(table).filter(col("cell").isin(cells.toSeq: _*))
    corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("new_id") =!= col("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
      .withColumn("cosine", Similarity.cosine(col("cvec"), col("nvec")))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("cosine"))
      // eager localCheckpoint: pair-sized output, cache manager stays
      // empty (the Dedup.releaseAfter discipline)
      .localCheckpoint()
  }

  /** The admission filter: the batch minus vectors semantically
    * duplicating the stored corpus. Compose with [[semanticDupPairs]]
    * for intra-batch dups, and [[IvfIndex.appendToStored]] to grow the
    * index with what's admitted.
    */
  def admitAgainstStored(spark: SparkSession, table: String, newVecs: DataFrame,
                         idCol: String, vecCol: String,
                         threshold: Double = 0.95, nprobe: Int = 2): DataFrame = {
    val dups = semanticDupAgainstStored(spark, table, newVecs, idCol, vecCol,
      threshold, nprobe)
    newVecs.join(dups.select(col("new_id")).distinct(),
      newVecs(idCol) === col("new_id"), "left_anti")
  }
}
