package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.functions.expressions.{hashed_set, shingles_fast}

/** Test-set contamination detection — the decontamination pass every
  * serious training-data pipeline runs before evaluation: a training
  * document is CONTAMINATED if it shares any length-n token gram with a
  * benchmark/eval document (the 13-gram overlap rule popularized by
  * GPT-3's appendix and used across The Pile / C4 descendants).
  *
  * Scale shape: the benchmark side is evaluation sets — thousands of
  * documents, small by construction — so its exploded gram table
  * BROADCASTS; the training corpus streams through one scan with a
  * map-side hash join and a single shuffle on contaminated doc ids for
  * the final counts. Grams travel as 64-bit xxhash values, never
  * strings. Documents shorter than n tokens fall back to a whole-text
  * gram ([[graft.functions.Shingles]] semantics), so short eval items
  * still match verbatim copies.
  */
object Contamination {

  /** One row per contaminated training document: how many distinct
    * grams matched, across how many benchmark documents.
    */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    def grams(df: DataFrame, id: String, text: String, out: String): DataFrame =
      df.select(col(id).cast("long").as(out),
        explode(hashed_set(shingles_fast(tokens(col(text)), n))).as("gram"))
    grams(docs, idCol, textCol, "doc_id")
      .join(broadcast(grams(bench, benchIdCol, benchTextCol, "bench_id")), Seq("gram"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("matched_grams"),
        countDistinct(col("bench_id")).as("bench_docs"))
  }

  /** Streaming dual: flag contaminated documents on a STREAM of
    * arrivals against a static benchmark — a stateless stream-static
    * join with the static gram side broadcast into every micro-batch.
    * Emits one (doc_id, bench_id, gram) row per hit; clean documents
    * emit nothing, so the common case is a map-side filter with no
    * state store at all. Fold hits per micro-batch with
    * [[contaminationCounts]] inside `foreachBatch` (a streaming
    * aggregation would add state for a metric that is per-arrival
    * anyway — the same batch-side-fold contract as
    * [[graft.streaming.StreamingDedup.admitted]]).
    */
  def contaminatedStream(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchIdCol: String, benchTextCol: String,
                         n: Int = 13): DataFrame = {
    val streamGrams = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(hashed_set(shingles_fast(tokens(col(textCol)), n))).as("gram"))
    val benchGrams = bench.select(col(benchIdCol).cast("long").as("bench_id"),
      explode(hashed_set(shingles_fast(tokens(col(benchTextCol)), n))).as("gram"))
    streamGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id"), col("bench_id"), col("gram"))
  }

  /** Batch-side fold over [[contaminatedStream]] hits: per-doc matched
    * gram / benchmark-doc counts, same shape as [[contaminated]].
    */
  def contaminationCounts(hitsBatch: DataFrame): DataFrame =
    hitsBatch.groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("matched_grams"),
        countDistinct(col("bench_id")).as("bench_docs"))

  /** The filter a pipeline applies: `docs` minus contaminated ones. */
  def decontaminated(docs: DataFrame, idCol: String, textCol: String,
                     bench: DataFrame, benchIdCol: String, benchTextCol: String,
                     n: Int = 13): DataFrame =
    docs.join(
      contaminated(docs, idCol, textCol, bench, benchIdCol, benchTextCol, n)
        .select(col("doc_id").as("__contaminated_id")),
      docs(idCol).cast("long") === col("__contaminated_id"), "left_anti")
}
