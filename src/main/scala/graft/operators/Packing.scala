package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing — the GPT-style pretraining layout: documents are
  * concatenated in a deterministic order inside each pack group and the
  * token stream is cut into fixed-`budget` sequences, documents spanning
  * sequence boundaries. Every (doc → sequence) incidence is closed-form
  * from the running token offset, so the whole operator is one window
  * cumsum + an explode — no sequential driver loop, no iteration.
  *
  * 100 TB design: the only shuffle is the window's partition-by on the
  * pack group key. Packing is per-group sequential BY DEFINITION (the
  * token offsets of a group form one ordered stream), so the group key
  * IS the parallelism: real pipelines pack per (source, shard) with
  * shards sized to executors — pass that composite as `groupCols`.
  * When the NATURAL group key is coarse and re-keying is not an option
  * (the manifest must stay per-source), pass `slices > 1`: the running
  * offset then decomposes through [[Ranking.slicedCumsum]]'s GK range
  * slicing — broadcast exclusive slice offsets + a window per
  * (group, slice) — with byte-identical output (spec-asserted) and
  * per-task input ≈ n_group/slices.
  */
object Packing {

  /** Per-document packing coordinates: running token offsets and the
    * [first_seq, last_seq] range of `budget`-token sequences the doc
    * overlaps. Purely integer arithmetic.
    *
    * ZERO-TOKEN DOCS (reachable whenever the caller's token counter
    * can yield 0 — e.g. [[graft.functions.TextFunctions.bpeishTokenCount]]
    * on symbol-free text; whitespace-split counts bottom out at 1 by
    * the cross-engine `split("")=[""]` convention): the doc
    * overlaps NO sequence, so its range is genuinely EMPTY —
    * `first_seq > last_seq` whenever `start_tok` sits exactly on a
    * budget boundary. Consumers must treat the range as half-open-empty
    * in that case, NOT feed it to Spark's `sequence(first, last)`,
    * which generates a DESCENDING range for first > last (phantom
    * incidences). [[packManifest]]/[[packManifestFrom]] filter them out
    * before the explode.
    */
  def withOffsets(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  tokenCol: String, budget: Int, slices: Int = 1): DataFrame = {
    val cum =
      if (slices <= 1) {
        val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, 0)
        df.withColumn("cum_tokens", sum(col(tokenCol)).over(w).cast("long"))
      } else Ranking.slicedCumsum(df, groupCols, orderCol, tokenCol, slices)
        .withColumnRenamed("__cum", "cum_tokens")
    cum
      .withColumn("start_tok", col("cum_tokens") - col(tokenCol))
      .withColumn("first_seq", floor(col("start_tok") / budget))
      .withColumn("last_seq", floor((col("cum_tokens") - 1) / budget))
  }

  /** Overlapping-window chunking — packing's sibling and the
    * embedding/RAG prep pass: each document yields windows of `size`
    * tokens every `stride` tokens (stride < size ⇒ overlap), last
    * window truncated, every token covered. Pure per-row map work —
    * the chunk positions are closed-form (`transform` over
    * `sequence`), so there is NO shuffle at all; `chunk_md5`
    * fingerprints the exact chunk text for byte-level verification.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("n", size_(col("toks")))
      // m = number of chunks: 1 + ceil((n - size)/stride) when n > size
      .withColumn("m",
        when(col("n") <= size, lit(1L))
          .otherwise(lit(1L) + ceil((col("n") - size) / lit(stride.toDouble)).cast("long")))
      .select(col("doc_id"), col("toks"),
        explode(transform(sequence(lit(0L), col("m") - 1), i =>
          struct(i.as("chunk_id"),
            (i * stride).as("start_tok"),
            least(i * stride + size, col("n")).as("end_tok")))).as("c"))
      .select(col("doc_id"),
        col("c.chunk_id").as("chunk_id"),
        col("c.start_tok").as("start_tok"),
        col("c.end_tok").as("end_tok"),
        (col("c.end_tok") - col("c.start_tok")).as("chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), col("c.start_tok") + 1,
            (col("c.end_tok") - col("c.start_tok")).cast("int")))).as("chunk_md5"))
  }

  // spark.sql.functions.size, unshadowed from this object's scope
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /** Per-sequence manifest: for each (group, seq_id), how many documents
    * land in it, the doc-id span, and the token count it holds (budget
    * for every sequence except each group's last). This is the table a
    * training job reads to materialize packed examples.
    */
  def packManifest(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   tokenCol: String, budget: Int, slices: Int = 1): DataFrame =
    manifestOf(withOffsets(df, groupCols, orderCol, tokenCol, budget, slices),
      groupCols, orderCol, budget)

  /** [[packManifest]] CONTINUED from per-group base token offsets — the
    * incremental-ingest form: a micro-batch packs where the previous
    * one stopped, so concatenated increments tile the one-shot batch
    * manifest exactly (per-(group, seq_id) token sums are equal once
    * partial rows at batch boundaries are summed — spec-asserted).
    * `baseOffsets` is (groupCols…, base_tok), group-sized (broadcast);
    * groups absent from it start at 0. Pair with a stored offsets
    * table merged via [[StoredMerge.upsertBuckets]] so the offset
    * state survives restarts crash-atomically.
    *
    * `slices` is the same scale knob as [[packManifest]]'s: with a
    * coarse natural group key (the flagship pipeline packs by split
    * bucket — THREE kept values), a one-shot drain would otherwise
    * sort the whole corpus through three window tasks. slices > 1
    * routes the running offset through [[Ranking.slicedCumsum]],
    * byte-identical output (spec-asserted at slices ∈ {1, 8}).
    */
  def packManifestFrom(df: DataFrame, groupCols: Seq[String], orderCol: String,
                       tokenCol: String, budget: Int,
                       baseOffsets: DataFrame, slices: Int = 1): DataFrame = {
    val withBase = withOffsets(df, groupCols, orderCol, tokenCol, budget, slices)
      .join(broadcast(baseOffsets
        .select((groupCols.map(col) :+ col("base_tok").cast("long")): _*)),
        groupCols, "left")
      .withColumn("__b", coalesce(col("base_tok"), lit(0L)))
      .withColumn("cum_tokens", col("cum_tokens") + col("__b"))
      .withColumn("start_tok", col("start_tok") + col("__b"))
      .withColumn("first_seq", floor(col("start_tok") / budget))
      .withColumn("last_seq", floor((col("cum_tokens") - 1) / budget))
      .drop("base_tok", "__b")
    manifestOf(withBase, groupCols, orderCol, budget)
  }

  /** The shared manifest roll-up over an offsets frame (see
    * [[withOffsets]] for the column contract). */
  private def manifestOf(withOff: DataFrame, groupCols: Seq[String],
                         orderCol: String, budget: Int): DataFrame = {
    val gcols = groupCols.map(col)
    withOff
      // zero-token docs overlap no sequence: their [first_seq, last_seq]
      // range is empty (first > last at exact budget boundaries, where
      // sequence() would generate a DESCENDING phantom range; equal-seq
      // elsewhere, where the row would land with 0 tokens and inflate
      // n_docs) — drop them before the explode
      .filter(col("cum_tokens") > col("start_tok"))
      .select(gcols :+ col(orderCol).as("doc_key") :+ col("start_tok") :+
        col("cum_tokens") :+
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"): _*)
      .withColumn("tokens_in_seq",
        least(col("cum_tokens"), (col("seq_id") + 1) * budget) -
          greatest(col("start_tok"), col("seq_id") * budget))
      .groupBy(gcols :+ col("seq_id"): _*)
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_key")).as("first_doc"),
        max(col("doc_key")).as("last_doc"),
        sum(col("tokens_in_seq")).cast("long").as("n_tokens"))
  }
}
