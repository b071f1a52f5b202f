package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, expressions => gx}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2004 — the MOSS local fingerprinting algorithm): slide a
  * window of `w` consecutive word-`k`-gram ranks over each document
  * and keep the minimum-rank gram per window (rightmost on ties).
  * The published guarantee: any shared run of ≥ `w + k - 1` words
  * between two documents yields at least one SHARED fingerprint, and
  * the expected density is 2/(w+1) — a position-robust alternative to
  * MinHash for substring-level overlap detection. Reference analogue:
  * none (extends the dedup family of [[Dedup]]/[[SpanDedup]]).
  *
  * The rank is `md5(gram)` (lowercase hex, compared as a string):
  * deterministic, pseudo-random across grams, and byte-identical in
  * any engine — so fingerprint sets hash-certify against a DuckDB
  * replay of the same construction (the q47 md5-ordering convention).
  * A production deployment would swap in `xxhash64` ranks (8-byte
  * state); the selection logic is rank-agnostic.
  *
  * Scale design (100 TB): gram construction is per-row codegen'd
  * expression work; the window-min selection is ONE window function
  * pass partitioned by the high-cardinality doc_id, ordered by gram
  * position with a bounded RANGE frame (w rows) — no self-join, no
  * O(G·w) blowup; the distinct on selected occurrences is a hash
  * aggregate keyed on (doc_id, pos). Per-document work is linear in
  * document length.
  */
object Winnow {

  /** Per-document winnowing fingerprints. Output: `doc_id, pos, gram,
    * rank` — one row per SELECTED gram occurrence (distinct positions;
    * the same gram selected by several windows appears once per
    * selected position).
    *
    * Windows are the `G - w + 1` full spans of `w` consecutive gram
    * positions (G = gram count); each selects its min-rank gram,
    * rightmost on rank ties. Documents with fewer than `w` grams get
    * their single global minimum (at least one fingerprint per
    * non-empty document, per the paper).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    val grams = df
      .select(col(idCol).as("doc_id"),
        gx.shingles_fast(TextFunctions.tokens(col(textCol)), k).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("g_total"),
        posexplode(col("gs")).as(Seq("gpos", "gram")))
      .withColumn("rank", md5(col("gram").cast("binary")))

    // One RANGE-framed window pass: for each window START gpos, the
    // min (rank, -pos, gram) struct over the next w gram positions —
    // min rank, rightmost position on rank ties; the struct carries
    // the winning gram and position out of the frame.
    val winFrame = Window.partitionBy(col("doc_id")).orderBy(col("gpos"))
      .rangeBetween(Window.currentRow, w - 1)
    grams
      .withColumn("sel", min(struct(col("rank"), (-col("gpos")).as("negpos"),
        col("gram"))).over(winFrame))
      // full windows only; a shorter-than-w document keeps its single
      // global min via the gpos = 0 window
      .filter(col("gpos") <= col("g_total") - w ||
        (col("g_total") < w && col("gpos") === 0))
      .select(col("doc_id"), (-col("sel.negpos")).cast("int").as("pos"),
        col("sel.gram").as("gram"), col("sel.rank").as("rank"))
      .distinct()
  }

  /** Persist a corpus's fingerprints BUCKETED AND SORTED ON rank (the
    * [[DedupIndex]] stored-state recipe): incremental admission joins
    * on rank, so checks against the stored corpus read it
    * exchange-free and bucket-pruned.
    */
  def store(fp: DataFrame, name: String, buckets: Int = 32): Unit =
    fp.select(col("doc_id"), col("pos"), col("gram"), col("rank"))
      .write.mode("overwrite")
      .bucketBy(buckets, "rank").sortBy("rank")
      .saveAsTable(s"${name}_winnow")

  /** Append a batch's fingerprints under the same bucket spec (doc_ids
    * must be fresh — the incremental-loop contract shared by the whole
    * stored family). O(batch): the stored rows are never rewritten.
    */
  def appendToStored(spark: SparkSession, name: String, batchFp: DataFrame,
                     buckets: Int = 32): Unit =
    batchFp.select(col("doc_id"), col("pos"), col("gram"), col("rank"))
      .write.mode("append")
      .bucketBy(buckets, "rank").sortBy("rank")
      .saveAsTable(s"${name}_winnow")

  /** Check an incoming batch against the stored corpus: per
    * (batch doc, stored doc) pair the shared-fingerprint count — the
    * incremental MOSS admission check. The join is keyed on rank:
    * the batch side (small) exchanges, the stored side rides its
    * bucketing (spec-asserted exchange-free).
    */
  def checkAgainstStored(spark: SparkSession, name: String, docs: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4, minShared: Long = 1L): DataFrame = {
    val batchFp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("rank"), col("doc_id").as("new_id")).distinct()
    val stored = spark.table(s"${name}_winnow")
      .select(col("rank"), col("doc_id").as("corpus_id")).distinct()
    batchFp.join(stored, Seq("rank"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Document pairs sharing at least `minShared` fingerprint GRAMS —
    * the MOSS candidate-pair report. Same bucketed contract as the
    * MinHash legs: pairs form only inside a fingerprint's posting
    * list, never all-pairs.
    */
  def sharedPairs(fp: DataFrame, minShared: Long = 1L): DataFrame = {
    val sides = fp.select(col("doc_id"), col("rank")).distinct()
    val a = sides.select(col("rank"), col("doc_id").as("id_a"))
    val b = sides.select(col("rank"), col("doc_id").as("id_b"))
    a.join(b, Seq("rank"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The MOSS similarity report: [[sharedPairs]] enriched with each
    * side's distinct-fingerprint count and the containment score
    * `n_shared / min(n_a, n_b)` (one IEEE division of exact
    * integers). The per-doc sizes ride a doc-keyed contraction join —
    * no second corpus pass.
    */
  def containmentPairs(fp: DataFrame, minShared: Long = 1L): DataFrame = {
    val sizes = fp.select(col("doc_id"), col("rank")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    sharedPairs(fp, minShared)
      .join(sizes.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"))
  }
}
