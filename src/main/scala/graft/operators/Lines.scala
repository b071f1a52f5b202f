package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level (sub-document) deduplication — the CCNet/RefinedWeb-style
  * boilerplate pass: a "line" repeated across many documents (headers,
  * nav text, license banners) is noise even when the documents
  * containing it are unique, so curation drops the line, not the doc.
  *
  * Lines here are delimiter-split segments when the corpus has real
  * newlines, or fixed-width token windows (`tokenLines`) for corpora
  * without line structure. Both produce the same downstream shape:
  * (doc_id, line_no, line).
  *
  * 100 TB design: the corpus-wide duplicate-line count groups and joins
  * on the 64-bit line hash, never the line text — one shuffle of
  * (hash, doc_id) pairs for the count, and the line table re-joins the
  * (small) boilerplate set by hash. Line text rides only the original
  * scan. No driver-side state anywhere.
  */
object Lines {

  /** Explode `textCol` into newline-delimited lines. */
  def split(df: DataFrame, idCol: String, textCol: String,
            delimiter: String = "\n"): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(org.apache.spark.sql.functions.split(col(textCol),
          java.util.regex.Pattern.quote(delimiter))))
      .select(col("doc_id"), col("pos").as("line_no"), col("col").as("line"))
      .filter(length(trim(col("line"))) > 0)

  /** Explode `textCol` into fixed-width pseudo-lines of `width` tokens
    * (for corpora without newline structure — deterministic, 1-based
    * slice arithmetic any engine reproduces).
    */
  def tokenLines(df: DataFrame, idCol: String, textCol: String,
                 width: Int = 8): DataFrame = {
    val toks = org.apache.spark.sql.functions.split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("n_lines", ceil(size(col("toks")) / lit(width.toDouble)).cast("int"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n_lines") - 1),
          i => struct(i.as("line_no"),
            concat_ws(" ", slice(col("toks"), i * width + 1, lit(width))).as("line")))).as("lk"))
      .select(col("doc_id"), col("lk.line_no").as("line_no"), col("lk.line").as("line"))
  }

  /** Line texts occurring in at least `minDocs` DISTINCT documents,
    * keyed by 64-bit hash: (line_hash, n_docs). The heavy group rides
    * hashes only.
    */
  def boilerplate(lines: DataFrame, minDocs: Int): DataFrame =
    lines.select(xxhash64(col("line")).as("line_hash"), col("doc_id"))
      .groupBy(col("line_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document line-dedup stats: total lines, boilerplate lines
    * (appearing in ≥ minDocs distinct docs corpus-wide), and the token
    * count that survives dropping them. The boilerplate set joins back
    * by hash; at corpus scale it is orders of magnitude smaller than
    * the line table, so the join's build side stays broadcastable.
    */
  def dedupStats(df: DataFrame, idCol: String, textCol: String,
                 width: Int = 8, minDocs: Int = 3): DataFrame = {
    val lines = tokenLines(df, idCol, textCol, width)
      .withColumn("line_hash", xxhash64(col("line")))
      .withColumn("n_tokens", size(org.apache.spark.sql.functions.split(col("line"), " ")))
    val dups = boilerplate(lines.select(col("doc_id"), col("line")), minDocs)
      .select(col("line_hash"), lit(1).as("is_dup"))
    lines.join(dups, Seq("line_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("is_dup")), lit(0)).cast("long").as("n_dup_lines"),
        sum(when(col("is_dup").isNull, col("n_tokens")).otherwise(0)).cast("long")
          .as("kept_tokens"))
  }

  /** The filtering form: documents with boilerplate lines removed
    * (line order preserved). What a curation pipeline actually writes.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        width: Int = 8, minDocs: Int = 3): DataFrame = {
    val lines = tokenLines(df, idCol, textCol, width)
      .withColumn("line_hash", xxhash64(col("line")))
    val dups = boilerplate(lines.select(col("doc_id"), col("line")), minDocs)
      .select(col("line_hash"), lit(1).as("is_dup"))
    lines.join(dups, Seq("line_hash"), "left")
      .filter(col("is_dup").isNull)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("line_no"), col("line"))))
        .getField("line")).as("text"))
  }
}
