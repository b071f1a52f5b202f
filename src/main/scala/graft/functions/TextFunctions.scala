package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for training-data pipelines. Everything
  * here is composed from codegen'd built-ins (`functions._`) — no UDFs,
  * no non-codegen expressions — so these fold into whole-stage codegen
  * and stay scan-adjacent at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: word runs + single non-word chars — the
    * standard pre-tokenization split used before byte-pair merges.
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** Occurrences of a literal word surrounded by spaces, via
    * length-difference (exact cross-engine parity, overlap-free).
    */
  def literalHits(c: Column, word: String): Column = {
    val needle = s" $word "
    ((length(c) - length(regexp_replace(c, needle, ""))) / needle.length).cast("int")
  }

  /** Punctuation characters count. */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("int")

  /** Sentence count: terminator runs ([.!?]+), min 1 for non-empty
    * text (a fragment with no terminator is one sentence) — the
    * standard readability denominator, engine-exact via regexp.
    */
  def sentenceCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L)).otherwise(
      greatest(lit(1L),
        size(regexp_extract_all(c, lit("[.!?]+"), lit(0))).cast("long")))

  /** Syllable proxy: vowel-group runs ([aeiouy]+) in lowercased text —
    * the classic Flesch heuristic (each maximal vowel cluster ≈ one
    * syllable). Exact integers, replayable in any regexp engine.
    */
  def syllableCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0))).cast("long")

  /** Flesch reading ease in exact milli-units — every division a
    * truncating integer div, so the score replays in any engine (the
    * float formula 206.835 − 1.015·w/s − 84.6·syll/w scaled by 1000
    * with each ratio pre-cleared to milli). Takes the NAMES of
    * materialized BIGINT columns (the repo's `expr("a div b")`
    * convention — Spark has no Column-level div):
    *   wps_milli = (1000·words) div sentences
    *   spw_milli = (1000·syllables) div words
    *   flesch_milli = 206835 − (1015·wps_milli) div 1000
    *                         − (84600·spw_milli) div 1000
    * Zero words/sentences yield null (no text, no score).
    */
  def fleschMilli(wordsCol: String, sentencesCol: String,
                  syllablesCol: String): Column =
    when(col(wordsCol) === 0 || col(sentencesCol) === 0,
      lit(null).cast("long")).otherwise(
      lit(206835L)
        - expr(s"(1015 * ((1000 * $wordsCol) div $sentencesCol)) div 1000")
        - expr(s"(84600 * ((1000 * $syllablesCol) div $wordsCol)) div 1000"))

  /** Integer quality heuristics (length, stopword presence, punct load) —
    * all-int arithmetic so engine comparisons are exact.
    */
  def isQuality(c: Column, minTokens: Int = 20): Column =
    (tokenCount(c) >= minTokens && literalHits(c, "the") >= 1).cast("int")

  /** Per-language stopword hit scores for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: the CASE chain below prefers
    * earlier languages on equal scores.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("de", "shi", "le"))

  def langScore(c: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(w => literalHits(c, w))
      .reduce(_ + _)

  /** argmax over language scores with fixed preference order. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Content fingerprint of normalized text: stable 64-bit hash (hex).
    * The rolling-hash use case (chunk-level fingerprints) composes this
    * over sliding token windows — see shingles below.
    */
  def fingerprint(c: Column): Column = xxhash64(lower(trim(c)))

  /** Word n-gram shingles (arrays of space-joined n-grams). */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }
}
