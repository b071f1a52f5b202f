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

  /** The two-corpus form — DSIR's actual setup: the target distribution
    * comes from a SEPARATE corpus (the high-quality set you want more
    * of), not a predicate over the raw one. Raw counts aggregate over
    * `docs`, target counts over `target`; a full outer merge of the two
    * count tables scores every gram (a raw-only gram has tgt_n = 0 — the
    * signal; a target-only gram never matches a doc occurrence and
    * drops out naturally). When `target` IS a subset of `docs`, this
    * reduces to [[weights]] with the membership predicate — spec-proven.
    */
  def weightsVsCorpus(docs: DataFrame, idCol: String, textCol: String,
                      target: DataFrame, targetIdCol: String,
                      targetTextCol: String): DataFrame = {
    val rawGrams = bigramOccurrences(docs, idCol, textCol, lit(false))
      .select(col("doc_id"), col("gram_hash"))
    val rawCounts = rawGrams.groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("raw_n"))
    val tgtCounts = bigramOccurrences(target, targetIdCol, targetTextCol, lit(false))
      .groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("tgt_n"))
    val counts = rawCounts.join(tgtCounts, Seq("gram_hash"), "full_outer")
      .select(col("gram_hash"),
        coalesce(col("raw_n"), lit(0L)).as("raw_n"),
        coalesce(col("tgt_n"), lit(0L)).as("tgt_n"))
    rawGrams.join(counts, Seq("gram_hash"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tgt_n")).cast("long").as("tgt_mass"),
        sum(col("raw_n")).cast("long").as("raw_mass"))
      .withColumn("importance",
        (col("tgt_mass") + 1).cast("double") / (col("raw_mass") + 1))
  }

  // ---- stored-counts form (incremental curation) -----------------------
  //
  // The operational shape at 100 TB ([[DedupIndex]]'s pattern): the
  // reference-corpus count table is fitted ONCE, stored bucketed by
  // gram_hash, and every incoming crawl batch scores against it with no
  // rebuild. Because the masses are plain sums, the stored table is
  // MERGEABLE — appending a new batch's (gram_hash, raw_n, tgt_n) delta
  // rows is a correct update (Σ over partial-count rows = Σ over the
  // union corpus), so growing the reference never rewrites it.

  /** Fit and persist the count table through the session catalog,
    * bucketed by gram_hash so batch-scoring joins need no exchange on
    * the stored side.
    */
  def saveCounts(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, table: String, buckets: Int = 32): Unit =
    bigramOccurrences(docs, idCol, textCol, targetPred)
      .groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("raw_n"),
        sum(col("is_target")).cast("long").as("tgt_n"))
      .write.mode("overwrite")
      .bucketBy(buckets, "gram_hash").sortBy("gram_hash")
      .saveAsTable(table)

  /** Append one batch's count delta (same bucket spec — Spark unions
    * bucketed appends per bucket, so the join-side layout survives).
    */
  def appendCounts(docs: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, table: String, buckets: Int = 32): Unit =
    bigramOccurrences(docs, idCol, textCol, targetPred)
      .groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("raw_n"),
        sum(col("is_target")).cast("long").as("tgt_n"))
      .write.mode("append")
      .bucketBy(buckets, "gram_hash").sortBy("gram_hash")
      .saveAsTable(table)

  /** Score an incoming batch against the stored reference counts. The
    * batch side shuffles by gram_hash to meet the bucketed stored
    * table; grams the reference has never seen contribute 0 (left
    * join + coalesce), so scoring is total. `is_target` of the batch
    * is irrelevant here — the reference distribution is the stored one.
    */
  def weightsAgainstStored(spark: org.apache.spark.sql.SparkSession,
                           table: String, docs: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val grams = bigramOccurrences(docs, idCol, textCol, lit(false))
      .select(col("doc_id"), col("gram_hash"))
    grams.join(spark.table(table), Seq("gram_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("tgt_n"), lit(0L))).cast("long").as("tgt_mass"),
        sum(coalesce(col("raw_n"), lit(0L))).cast("long").as("raw_mass"))
      .withColumn("importance",
        (col("tgt_mass") + 1).cast("double") / (col("raw_mass") + 1))
  }
}
