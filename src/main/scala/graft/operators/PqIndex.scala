package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.expressions.{pq_adc, pq_encode}

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): compress each embedding to m
  * one-byte codes (one L2-nearest codebook centroid per subspace) and
  * rank neighbors by asymmetric distance — dot(query, reconstructed
  * centroids) — directly on the codes.
  *
  * The 100 TB story is IO, not FLOPs: a brute-force cosine scan over
  * 100 TB of float32 vectors reads 100 TB; the same scan over PQ codes
  * reads m/(4·dim) of that (64-dim × m=16 → 16×, 6 TB; clustered real
  * embedding corpora tolerate smaller m — the synthetic near-uniform
  * test vectors are PQ's worst case). Compute per
  * candidate stays O(dim) either way — PQ moves the bottleneck from
  * the scan to the (tiny) top-k maintenance:
  *
  *  - codebooks train on a bounded deterministic sample collected to
  *    the driver ([[IvfIndex]]'s recipe), per-subspace plain-L2 Lloyd —
  *    m × ksub × (dim/m) doubles of model state, broadcast as ONE
  *    reference object inside the [[graft.functions.PqEncode]] /
  *    [[graft.functions.PqAdc]] expressions (codegen-safe at any ksub);
  *  - corpus vectors are unit-normalized before encoding, queries are
  *    normalized inside ADC — so the ADC score approximates cosine and
  *    ranks compatibly with the rest of the similarity family;
  *  - encoding and the ADC scan are single passes with zero shuffle;
  *    the query set broadcasts (it is the probe side, small by
  *    construction);
  *  - [[searchRerank]] runs the standard two-stage: ADC top-(k·refine)
  *    on codes, then exact cosine on the (candidate-sized!) set of
  *    fetched vectors — the fetch broadcasts candidate ids into the
  *    corpus scan, so no corpus-sized exchange anywhere (minhashLSH's
  *    semi-prune lesson);
  *  - composes with IVF for the scan-fraction win: encode the IVF
  *    cell assignment's vectors and ADC only the probed cells. The
  *    bucketed-index plumbing for that composition is [[IvfIndex]]'s —
  *    the `assigned` table just carries `codes` instead of `cvec`.
  */
object PqIndex {

  /** codebooks(sub)(code) = centroid of subspace `sub`; encoded has
    * (corpus_id, codes: binary).
    */
  final case class Model(codebooks: Array[Array[Array[Double]]], encoded: DataFrame)

  /** Plain-L2 Lloyd per subspace (NOT [[IvfIndex.lloyd]]'s spherical
    * argmax-dot: subvectors of a unit vector are not themselves unit,
    * and reconstruction error is what PQ minimizes). Deterministic
    * seeded init; emptied cells keep their previous centroid.
    */
  private[operators] def lloydL2(points: Array[Array[Double]], k: Int,
                                 maxIter: Int, seed: Long): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "PQ fit needs at least one training vector")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle((0 until n).toVector)
    val cents = Array.tabulate(k)(j => points(order(j % n)).clone())
    val assign = new Array[Int](n)
    var iter = 0
    while (iter < maxIter) {
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        val p = points(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ce = cents(c)
          var d2 = 0.0; var d = 0
          while (d < dim) { val t = p(d) - ce(d); d2 += t * t; d += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
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

  /** Per-subspace codebooks from already-normalized training points. */
  private[operators] def fitCodebooks(points: Array[Array[Double]], m: Int, ksub: Int,
                                      maxIter: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(points.nonEmpty, "PQ fit needs training vectors")
    val dim = points(0).length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { sub =>
      val subPoints = points.map(p => java.util.Arrays.copyOfRange(p, sub * dsub, (sub + 1) * dsub))
      lloydL2(subPoints, ksub, maxIter, seed + sub)
    }
  }

  /** Train on a bounded sample, encode the whole corpus in one scan. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
            m: Int = 16, ksub: Int = 256, seed: Long = 42L, maxIter: Int = 10,
            maxTrain: Long = 65536L): Model = {
    val withVec = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val n = corpus.count()
    val sampled =
      if (n <= maxTrain) withVec
      else withVec.sample(withReplacement = false, maxTrain.toDouble / n, seed)
    val points = sampled.select(col("cvec").cast("array<double>")).collect()
      .map(r => unitize(r.getSeq[Double](0).toArray))
    val codebooks = fitCodebooks(points, m, ksub, maxIter, seed)
    val encoded = withVec
      .select(col("corpus_id"), pq_encode(col("cvec"), codebooks).as("codes"))
    Model(codebooks, encoded)
  }

  /** ADC top-k: one scan over the codes, query set broadcast. */
  def search(model: Model, queries: DataFrame, idCol: String, vecCol: String,
             k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = model.encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adc", pq_adc(col("codes"), col("qvec"), model.codebooks))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("adc"))
  }

  /** Two-stage: ADC shortlist of k·refine on codes, exact cosine
    * re-rank on fetched vectors. The vector fetch broadcasts the
    * (small) shortlist into the corpus scan — only shortlist-sized
    * data rides any exchange.
    */
  def searchRerank(model: Model, corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int = 5, refine: Int = 8): DataFrame = {
    val shortlist = search(model, queries, idCol, vecCol, k = k * refine)
      .select(col("query_id"), col("corpus_id"))
    val vecs = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .join(broadcast(shortlist), Seq("corpus_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val exact = vecs.join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
