package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.expressions.nearest_cells

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; each query probes only
  * its `nprobe` closest cells and re-ranks by exact cosine within them.
  *
  * The 100 TB shape:
  *  - the quantizer trains on a bounded deterministic sample
  *    (`maxTrain` vectors) collected to the driver and fit with a tight
  *    Lloyd's loop — bounded by construction (maxTrain × dim doubles),
  *    cost independent of corpus size, and free of the per-iteration
  *    job overhead a distributed fit pays on what is always small data
  *    (the standard coarse-quantizer recipe: sample → local fit →
  *    broadcast centroids);
  *  - vectors are unit-normalized before fit, so Euclidean k-means is
  *    spherical k-means and the cells match the cosine routing used at
  *    query time;
  *  - cell assignment and query routing both go through the
  *    [[graft.functions.NearestCells]] expression: the centroid matrix
  *    is ONE broadcast-able plan reference, not nlist literal columns
  *    (codegen-safe at nlist=4096), and both are single scans with no
  *    shuffle;
  *  - corpus vectors are multi-assigned to their `nassign` nearest
  *    cells (storage × nassign — the recall/storage knob; measured
  *    recall@5 at nlist=16/nprobe=4 on the test embeddings: 0.62 at
  *    nassign=1, 0.84 at 2, 0.90 at 3, 0.94 at 4). Neighbors that
  *    straddle a cell boundary — the dominant recall loss in
  *    coarse-quantized ANN — stay co-located with the query's probes.
  *    At larger nlist (4096+) replication stays the same ×nassign but
  *    each probe touches a far smaller corpus fraction; deployments
  *    that can't afford vector replication can store only
  *    (cell, corpus_id) and re-join vectors by id at re-rank cost;
  *  - at query time the probe set (queries × nprobe rows) is broadcast
  *    into the corpus-side join, so the corpus — written bucketed by
  *    `cell` — never shuffles, and a probe touches ~nprobe/nlist of it.
  *
  * Deterministic: fixed seed for the sample, the init, and the fit.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame) {
    def centroidMatrix: Array[Array[Double]] = centroids.sortBy(_._1).map(_._2)
  }

  /** Plain Lloyd's k-means over unit vectors (spherical: on normalized
    * points argmin-L2 == argmax-dot). Deterministic seeded random init;
    * an emptied cell keeps its previous centroid. Assignment is the hot
    * loop and runs across cores; the mean update is one serial O(n·dim)
    * sweep.
    */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int,
                               maxIter: Int, seed: Long): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "k-means needs at least one training vector")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle((0 until n).toVector)
    val cents = Array.tabulate(k)(j => points(order(j % n)).clone())
    val assign = new Array[Int](n)
    var iter = 0
    while (iter < maxIter) {
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        val p = points(i)
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val ce = cents(c)
          var s = 0.0; var d = 0
          while (d < dim) { s += p(d) * ce(d); d += 1 }
          if (s > bestDot) { bestDot = s; best = c }
          c += 1
        }
        assign(i) = best
      }
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val c = assign(i); val p = points(i)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += p(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { cents(c)(d) = sums(c)(d) / counts(c); d += 1 }
        }
        c += 1
      }
      iter += 1
    }
    cents
  }

  private def unitize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) v else v.map(_ / nrm)
  }

  /** Build: train the quantizer on a bounded sample, then assign every
    * corpus vector its `nassign` nearest cells in one scan.
    */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int = 16, seed: Long = 42L, maxIter: Int = 10,
            maxTrain: Long = 65536L, nassign: Int = 4): Index = {
    val withVec = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    // count the RAW scan (parquet metadata answers it) before projections
    val n = corpus.count()
    val sampled =
      if (n <= maxTrain) withVec
      else withVec.sample(withReplacement = false, maxTrain.toDouble / n, seed)
    // Bounded by construction: <= maxTrain × dim doubles on the driver.
    val points = sampled.select(col("cvec").cast("array<double>")).collect()
      .map(r => unitize(r.getSeq[Double](0).toArray))
    val centroidMatrix = lloyd(points, nlist, maxIter, seed)
    val assigned = withVec
      .withColumn("cell", explode(nearest_cells(col("cvec"), centroidMatrix, nassign)))
      .select(col("corpus_id"), col("cvec"), col("cell"))
    Index(centroidMatrix.zipWithIndex.map { case (c, i) => i -> c }, assigned)
  }

  /** Query: route each probe vector to its nprobe nearest cells (same
    * NearestCells scan — no join, no window), then probe only those
    * cells with the probe set broadcast; exact cosine re-rank within.
    */
  def search(spark: SparkSession, index: Index, queries: DataFrame,
             idCol: String, vecCol: String, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell", explode(nearest_cells(col("qvec"), index.centroidMatrix, nprobe)))

    // Probe set is small (queries × nprobe) — broadcast it so the
    // bucketed corpus never shuffles. dropDuplicates collapses the
    // multi-assignment copies before ranking.
    val candidates = index.assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", Similarity.cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Persist the assignment table BUCKETED BY CELL (plus a centroid
    * table), so repeated query workloads against a stored index scan
    * only their probed buckets: [[searchStored]] pushes `cell IN
    * (probes)` into the scan, and bucket pruning reads ~nprobe/nlist of
    * the files — the piece that turns the probe join from "scan the
    * corpus, join cheap" into "scan almost nothing". Bucket count = one
    * bucket per cell.
    *
    * (Uses the session catalog: with the default in-memory catalog the
    * table registration lives for the session; point the session at a
    * persistent metastore for cross-session reuse — the data files and
    * layout are identical either way.)
    */
  def saveIndex(spark: SparkSession, index: Index, table: String): Unit = {
    val nlist = index.centroids.length
    index.assigned.write.mode("overwrite")
      .bucketBy(nlist, "cell").sortBy("cell")
      .saveAsTable(table)
    import spark.implicits._
    index.centroids.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(s"${table}_centroids")
  }

  /** Load the centroid matrix back from a stored index. */
  def loadCentroids(spark: SparkSession, table: String): Array[Array[Double]] =
    spark.table(s"${table}_centroids")
      .collect()
      .map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)

  /** Grow a STORED index without refitting: route the new vectors
    * through the STORED centroids and append their assignments into the
    * bucketed table (same bucketBy spec, so [[searchStored]] keeps
    * bucket-pruning over old and new rows alike). The quantizer is
    * intentionally frozen — standard IVF practice: distribution drift
    * is handled by periodic rebuilds, not per-batch refits that would
    * silently invalidate every stored cell assignment.
    */
  def appendToStored(spark: SparkSession, table: String, newVecs: DataFrame,
                     idCol: String, vecCol: String, nassign: Int = 4): Unit = {
    val centroidMatrix = loadCentroids(spark, table)
    newVecs.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .withColumn("cell", explode(nearest_cells(col("cvec"), centroidMatrix, nassign)))
      .select(col("corpus_id"), col("cvec"), col("cell"))
      .write.mode(SaveMode.Append)
      .bucketBy(centroidMatrix.length, "cell").sortBy("cell")
      .saveAsTable(table)
  }

  /** [[search]] against a stored bucketed index. The probe-cell set is
    * computed on the driver (queries are small by construction — they
    * are the probe side), so the `cell IN (...)` filter is a literal
    * predicate the scan can bucket-prune on.
    */
  def searchStored(spark: SparkSession, table: String, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int = 5,
                   nprobe: Int = 4): DataFrame = {
    val (_, out) = searchStoredPlan(spark, table, queries, idCol, vecCol,
      k, nprobe)
    // eager localCheckpoint: k·|queries| rows, and nothing is left
    // registered in the cache manager (Dedup.releaseAfter discipline);
    // the probe frame is lazy and un-persisted — nothing to release
    out.localCheckpoint()
  }

  /** [[searchStored]]'s lazy plan, pre-materialization — (query probe
    * frame, top-k result). Split out so specs can inspect the
    * bucket-pruned scan (the shipped wrapper reads back the
    * checkpointed LogicalRDD).
    */
  private[graft] def searchStoredPlan(spark: SparkSession, table: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): (DataFrame, DataFrame) = {
    val centroidMatrix = loadCentroids(spark, table)
    // the cell list for the scan's bucket prune needs ONLY the 4-byte
    // cell column — computed as its own pass so the query vectors are
    // never persisted batch-wide (the r16 dedup-family law: nothing
    // batch-scaled lives in executor storage; the routing recompute is
    // one dims×nlist pass over a frame read straight off its source)
    val probe0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val probed = probe0
      .withColumn("cell", explode(nearest_cells(col("qvec"), centroidMatrix, nprobe)))
    val cells = probe0
      .select(explode(nearest_cells(col("qvec"), centroidMatrix, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0))
    val corpus = spark.table(table).filter(col("cell").isin(cells.toSeq: _*))
    val candidates = corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", Similarity.cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    val out = candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
    (probed, out)
  }
}
