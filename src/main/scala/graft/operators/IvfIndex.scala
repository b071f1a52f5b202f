package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; each query probes only
  * its `nprobe` closest cells and re-ranks by exact cosine within them.
  *
  * The 100 TB shape: centroids are tiny (nlist × dim) and broadcast;
  * the corpus is written partitioned/bucketed by cell id so a probe
  * touches `nprobe / nlist` of the data — with nlist=4096 and nprobe=8
  * that's ~0.2% of the corpus per query. Training samples the corpus
  * (KMeans on a fraction), assignment is one scan.
  *
  * Deterministic: fixed seed, fixed maxIter — same cells across runs.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** Build: train the quantizer and assign every corpus vector a cell. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int = 16, seed: Long = 42L, maxIter: Int = 20): Index = {
    val withVec = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .withColumn("features", array_to_vector(col("cvec").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("corpus_id"), col("cvec"), col("cell"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> c.toArray }
    Index(centroids, assigned)
  }

  /** Query: route each probe vector to its nprobe nearest centroids
    * (computed against the broadcast centroid array), join only those
    * cells, cosine re-rank.
    */
  def search(spark: SparkSession, index: Index, queries: DataFrame,
             idCol: String, vecCol: String, k: Int = 5, nprobe: Int = 4): DataFrame = {
    // distance of a query to every centroid, keep nprobe closest cells
    val centroidCols = index.centroids.map { case (cellId, c) =>
      val cLit = array(c.map(lit): _*)
      struct(lit(cellId).as("cell"),
        Similarity.dot(col("qvec"), cLit)
          .divide(Similarity.norm(cLit) * Similarity.norm(col("qvec"))).as("sim"))
    }
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cells",
        slice(reverse(array_sort(array(centroidCols.toSeq: _*),
          (a, b) => when(a("sim") < b("sim"), -1).when(a("sim") > b("sim"), 1).otherwise(0))),
          1, nprobe))
      .select(col("query_id"), col("qvec"), explode(col("cells.cell")).as("cell"))

    val candidates = probed.join(index.assigned, Seq("cell"))
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
