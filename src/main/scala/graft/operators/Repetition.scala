package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, expressions => gx}

/** Per-document repetition quality signals — the published Gopher /
  * MassiveText filter family (Rae et al. 2021, "Scaling Language
  * Models", table A1): heavily repetitive documents (boilerplate,
  * keyword stuffing, scraper loops) are low-quality training data and
  * are filtered on (a) the character fraction of the single most
  * frequent word n-gram and (b) the character fraction COVERED by word
  * n-grams that occur more than once in the document. Reference
  * analogue: none (the loader has no content analysis) — this extends
  * the curation family ([[graft.functions.Curation]], q39/q49).
  *
  * Both signals are exact integers plus one IEEE division, so results
  * hash-certify against a DuckDB replay (the q46 string-gram
  * convention). "Covered" is defined position-exactly: a gram at word
  * position i covers positions i..i+n-1; a position is covered if ANY
  * duplicated gram occurrence covers it; the covered character count
  * is the sum of word lengths over DISTINCT covered positions
  * (overlapping occurrences never double-count).
  *
  * Scale design (100 TB): tokenization and gram construction are
  * per-row codegen'd expression work ([[gx.shingles_fast]]); the only
  * shuffles are hash aggregates keyed on (doc_id) or (doc_id, gram) —
  * high-cardinality, map-side-partial, skew-free. The top-gram window
  * is partitioned by doc_id (high-cardinality).
  *
  * For streaming (and as the zero-shuffle production hot path) use
  * [[signalsInline]]: the same signals off the single-pass codegen'd
  * [[graft.functions.RepetitionSignals]] expression — row-local, so
  * it runs unchanged under Structured Streaming where this relational
  * form's windows cannot; a parity spec pins the two row-identical,
  * transferring the oracle certification to the inline path.
  */
object Repetition {

  /** Per-document repetition signals. Output:
    * `doc_id, n_words, word_chars, top_gram, top_gram_count,
    * top_gram_frac, dup_covered_chars, dup_frac`.
    *
    * - `word_chars` = Σ length(word) — separator-free character mass.
    * - `top_gram` = the most frequent `topN`-gram under the total
    *   order (count desc, gram asc); `top_gram_frac` = its occurrence
    *   count × its separator-free length / word_chars.
    * - `dup_covered_chars` = Σ length(word) over distinct positions
    *   covered by `dupN`-grams occurring ≥ 2 times in the document;
    *   `dup_frac` = that / word_chars.
    */
  def signals(df: DataFrame, idCol: String, textCol: String,
              topN: Int = 2, dupN: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))

    val words = toks.select(col("doc_id"),
      posexplode(col("t")).as(Seq("pos", "word")))
    val docStats = words.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("word_chars"))

    // top-N-gram: counts keyed on (doc_id, gram), leader by window
    // partitioned on the high-cardinality doc_id
    val gramsTop = toks.select(col("doc_id"),
      explode(gx.shingles_fast(col("t"), topN)).as("gram"))
    val topGram = gramsTop.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("gram").as("top_gram"),
        col("cnt").as("top_gram_count"),
        (col("cnt") * length(regexp_replace(col("gram"), " ", "")))
          .cast("long").as("top_gram_chars"))

    // duplicated-dupN-gram coverage: occurrences with positions, dup
    // set by per-(doc, gram) count, position intervals unioned by a
    // distinct on (doc_id, pos)
    val gramsDup = toks.select(col("doc_id"),
      posexplode(gx.shingles_fast(col("t"), dupN)).as(Seq("gpos", "gram")))
    val dupOcc = gramsDup
      .withColumn("occ", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("gram"))))
      .filter(col("occ") >= 2)
    val covered = dupOcc
      .select(col("doc_id"),
        explode(sequence(col("gpos"), col("gpos") + lit(dupN - 1))).as("pos"))
      .distinct()
      .join(words, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"))
      .agg(sum(length(col("word"))).cast("long").as("dup_covered_chars"))

    docStats
      .join(topGram, Seq("doc_id"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("word_chars"),
        col("top_gram"), col("top_gram_count"),
        (col("top_gram_chars").cast("double") / col("word_chars"))
          .as("top_gram_frac"),
        coalesce(col("dup_covered_chars"), lit(0L)).as("dup_covered_chars"),
        (coalesce(col("dup_covered_chars"), lit(0L)).cast("double") /
          col("word_chars")).as("dup_frac"))
  }

  /** [[signals]] computed row-locally in ONE pass by the codegen'd
    * [[graft.functions.RepetitionSignals]] expression — no explode,
    * no shuffle, no window; identical output (spec-pinned). This is
    * the form to embed in scans, curation pipelines, and streaming
    * queries. Empty documents (tokenizer yields `[""]`) come out with
    * `word_chars = 0` exactly as the relational form's single
    * empty-word row does.
    */
  def signalsInline(df: DataFrame, idCol: String, textCol: String,
                    topN: Int = 2, dupN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
        gx.repetition_signals(TextFunctions.tokens(col(textCol)), topN, dupN).as("r"))
      .select(col("doc_id"),
        col("r.n_words").cast("long").as("n_words"),
        col("r.word_chars").as("word_chars"),
        col("r.top_gram").as("top_gram"),
        col("r.top_gram_count").as("top_gram_count"),
        (col("r.top_gram_chars").cast("double") / col("r.word_chars"))
          .as("top_gram_frac"),
        col("r.dup_covered_chars").as("dup_covered_chars"),
        (col("r.dup_covered_chars").cast("double") / col("r.word_chars"))
          .as("dup_frac"))

  /** The Gopher-style keep/drop gate composed from [[signals]]:
    * keep docs whose top-gram fraction and duplicate-gram coverage
    * are both under their thresholds. Stateless given the signals —
    * streaming-safe by construction.
    */
  def gate(df: DataFrame, idCol: String, textCol: String,
           maxTopGramFrac: Double = 0.20, maxDupFrac: Double = 0.50,
           topN: Int = 2, dupN: Int = 3,
           inline: Boolean = false): DataFrame =
    (if (inline) signalsInline(df, idCol, textCol, topN, dupN)
     else signals(df, idCol, textCol, topN, dupN))
      .withColumn("keep",
        col("top_gram_frac") <= maxTopGramFrac &&
        col("dup_frac") <= maxDupFrac)
}
