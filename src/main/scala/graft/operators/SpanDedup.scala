package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-substring (span) deduplication — the ExactSubstr pass of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed for a distributed engine: instead of a
  * monolithic suffix array, every token position emits a k-token
  * rolling gram; a gram occurring at ≥2 positions corpus-wide marks
  * all its positions as duplicated; per document, overlapping or
  * adjacent duplicated positions merge into maximal spans. A span is
  * exactly a repeated substring of ≥ k tokens (every length-(≥k)
  * repeat is a run of repeated k-grams, and conversely), so the
  * operator finds the same spans the suffix-array construction finds,
  * at threshold k.
  *
  * 100 TB design:
  *  - the corpus-wide duplicate detection groups on the 64-bit gram
  *    HASH — shuffle payload is (hash, doc_id, pos), never text;
  *  - the per-position gram table is built with `transform` over
  *    `sequence` inside the scan projection (codegen'd, no
  *    token-explode + self-join);
  *  - the span merge is a per-document window (partitioned by doc_id —
  *    parallel across docs, sequential only within one doc's
  *    duplicated positions, which is inherent to interval merging);
  *  - the duplicated-position table re-joined for the merge is
  *    duplicate-sized, not corpus-sized.
  */
object SpanDedup {

  /** (doc_id, pos, gram_hash) for every k-token window. One row per
    * token position; the gram itself is never materialized as text —
    * `xxhash64` eats the concat inside the same projection.
    */
  def gramPositions(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k)
      .select(col("doc_id"), col("n"),
        explode(transform(sequence(lit(0), col("n") - k), i =>
          struct(i.as("pos"),
            xxhash64(concat_ws("\u0001", slice(col("toks"), i + 1, lit(k))))
              .as("gram_hash")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"),
        col("g.gram_hash").as("gram_hash"))
  }

  /** Positions covered by a gram that occurs at ≥2 positions anywhere
    * in the corpus (including twice within one document — ExactSubstr
    * counts self-repeats). Grouping and the semi-join ride hashes only.
    */
  def duplicatedPositions(grams: DataFrame): DataFrame = {
    val dup = grams.groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("gram_hash"))
    grams.join(dup, Seq("gram_hash"), "left_semi")
      .select(col("doc_id"), col("pos"))
  }

  /** Merge duplicated positions into maximal spans `[start, end)` in
    * token coordinates: classic island detection — a position starts a
    * new span iff it lies beyond the running max end of everything
    * before it.
    */
  def spans(dupPos: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    dupPos
      .withColumn("new_span",
        when(coalesce(max(col("pos") + k).over(prev), lit(-1L)) >= col("pos"),
          lit(0)).otherwise(lit(1)))
      .withColumn("span_id", sum(col("new_span")).over(byDoc))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end"))
  }

  /** Per-document repeated-span stats: span count, duplicated-token
    * total, token count, duplicated fraction (one IEEE division —
    * engine-exact). Only documents containing at least one duplicated
    * span appear.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 8): DataFrame = {
    val grams = gramPositions(docs, idCol, textCol, k)
    val sp = spans(duplicatedPositions(grams), k)
    val nTok = docs.select(col(idCol).as("doc_id"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    sp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).cast("long").as("dup_tokens"))
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens")).as("dup_frac"))
  }

  /** The filtering form: documents with every duplicated span removed
    * (ExactSubstr drops ALL occurrences of a repeat, first included —
    * reference semantics of Lee et al. §3.2). Token order preserved.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8): DataFrame = {
    val grams = gramPositions(docs, idCol, textCol, k)
    val sp = spans(duplicatedPositions(grams), k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
    val toks = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ",
          filter(
            transform(col("toks"), (t, i) =>
              when(exists(coalesce(col("sp"),
                  array().cast("array<struct<span_start:long,span_end:long>>")),
                s => i >= s.getField("span_start") && i < s.getField("span_end")),
                lit(null).cast("string")).otherwise(t)),
            t => t.isNotNull)).as("text"))
  }
}
