package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance weighting — DSIR (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") with the
  * hashed-bigram feature space, deterministic-exact: instead of the
  * paper's log-ratio of smoothed bag-of-ngrams probabilities (libm
  * last-ulp drift would break cross-engine equality), the weight is
  * the add-one ratio of summed corpus frequencies
  *
  *   importance(d) = (Σ_{g∈d} n_target(g) + 1) / (Σ_{g∈d} n_raw(g) + 1)
  *
  * — both sums exact integers, one IEEE division. A document whose
  * bigrams are frequent in the target slice and rare elsewhere scores
  * high; the ordering is the resampling signal.
  *
  * 100 TB design: one groupBy on the 64-bit bigram hash (count raw and
  * target occurrences in the same pass — target membership rides as a
  * 0/1, no second scan), one hash-join of the per-position gram table
  * against the gram-count table, one groupBy on doc_id. Text never
  * rides a shuffle; there is no per-gram driver state (the feature
  * "model" IS the distributed count table, which is what lets the
  * target slice be arbitrarily large — DSIR's hashed features exist
  * for exactly this reason).
  */
object Importance {

  /** (doc_id, gram_hash, is_target) — one row per bigram occurrence. */
  def bigramOccurrences(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol).as("doc_id"),
        targetPred.cast("int").as("is_target"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("is_target"),
        explode(transform(sequence(lit(0), col("n") - 2), i =>
          xxhash64(concat_ws("\u0001", slice(col("toks"), i + 1, lit(2))))))
          .as("gram_hash"))
  }

  /** Per-document target/raw frequency masses and the importance
    * ratio. Documents need ≥1 bigram to appear (an inner join against
    * the count table — every gram has a count, so no doc with a bigram
    * is lost).
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              targetPred: Column): DataFrame = {
    val grams = bigramOccurrences(docs, idCol, textCol, targetPred)
    val counts = grams.groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("raw_n"),
        sum(col("is_target")).cast("long").as("tgt_n"))
    grams.join(counts, Seq("gram_hash"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tgt_n")).cast("long").as("tgt_mass"),
        sum(col("raw_n")).cast("long").as("raw_mass"))
      .withColumn("importance",
        (col("tgt_mass") + 1).cast("double") / (col("raw_mass") + 1))
  }

  /** The selection form: deterministic top-`quota` by importance under
    * the total order (importance desc, doc_id asc) — the greedy
    * variant of DSIR's proportional resampling (no RNG can cross an
    * engine boundary; rank-under-total-order can).
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
             targetPred: Column, quota: Int): DataFrame =
    weights(docs, idCol, textCol, targetPred)
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(quota)
}
