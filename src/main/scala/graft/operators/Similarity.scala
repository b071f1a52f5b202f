package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline. Queries are
  *    broadcast; the corpus is never shuffled, so this scales linearly
  *    with corpus size × query count.
  *  - random-hyperplane LSH — the 100 TB path. Each vector gets a
  *    b-bit signature (sign of dot with b seeded pseudo-random planes);
  *    banded bucket join prunes the candidate set, cosine re-ranks
  *    within buckets. Planes are generated from a fixed seed, so
  *    signatures are deterministic across runs and executors.
  *
  * All vector math uses higher-order functions (zip_with/aggregate) —
  * codegen'd, no UDF serialization of the float arrays.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate, computed in double. Kept as the
    * composed reference form ([[graft.functions.CosineSim]] is spec-
    * checked against it); the shipped cosine below uses the fused
    * codegen kernel — the HOF form allocates an intermediate array per
    * row, which dominates multi-million-pair re-rank stages.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass codegen'd cosine — the hot kernel of every
    * embedding operator. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.cosine_sim(a, b)

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` must be small enough to broadcast (it is, by construction:
    * it's the probe set).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes. */
  def planes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** b-bit signature column: bit i = sign(dot(v, plane_i)). The plane
    * matrix is a single codegen reference object ([[graft.functions.HyperplaneSig]]),
    * not one literal array column per plane — the composed form hit the
    * same codegen blowup at high `bits` that sank the literal-centroid
    * IVF at nlist=4096.
    */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.expressions.hyperplane_sig(vec, planes)

  /** Approximate top-k: signature bands bucket the corpus; queries probe
    * their own buckets; cosine re-ranks. With `bits`=16 and 2 bands of 8
    * bits, recall is high for near neighbors while each bucket holds
    * ~corpus/2^8 vectors — the candidate set (and the shuffle) shrinks by
    * orders of magnitude vs brute force.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 5,
              bits: Int = 16, bands: Int = 2, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    require(bits % bands == 0)
    val bandBits = bits / bands
    val ps = planes(bits, dim, seed)
    val mask = (1L << bandBits) - 1

    def withBands(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        signature(col(vec), ps).as("sig"))
        .select(col(id), col(vec),
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              call_function("shiftright", col("sig"), b * lit(bandBits)).bitwiseAND(lit(mask)).as("band_val")))).as("bk"))
        .select(col(id), col(vec), col("bk.band"), col("bk.band_val"))

    val c = withBands(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec")),
      "corpus_id", "cvec")
    val q = withBands(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
      "query_id", "qvec")

    val candidates = c.join(q, Seq("band", "band_val"))
      .filter(col("corpus_id") =!= col("query_id"))
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: LSH buckets + cosine threshold —
    * the embedding leg of the dedup family.
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, bits: Int = 16, bands: Int = 2,
                     dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bandBits = bits / bands
    val ps = planes(bits, dim, seed)
    val mask = (1L << bandBits) - 1
    val sigs = df.select(col(idCol).as("doc_id"), col(vecCol).as("vec"),
        signature(col(vecCol), ps).as("sig"))
      .select(col("doc_id"), col("vec"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            call_function("shiftright", col("sig"), b * lit(bandBits)).bitwiseAND(lit(mask)).as("band_val")))).as("bk"))
      .select(col("doc_id"), col("vec"), col("bk.band"), col("bk.band_val"))
    val l = sigs.select(col("band"), col("band_val"), col("doc_id").as("id_a"), col("vec").as("vec_a"))
    val r = sigs.select(col("band"), col("band_val"), col("doc_id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
