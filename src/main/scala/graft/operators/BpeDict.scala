package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored BPE tokenizer dictionary — the [[DedupIndex]] / [[NgramLM]]
  * stored-index pattern applied to [[BpeFit.encode]]. `encode` refits
  * nothing but still replays the merge loop for every distinct word of
  * every run; operationally a tokenizer is FROZEN after training, and
  * the daily job is "tokenize this batch with it". This module
  * persists the fitted tokenizer once —
  *
  *  - `<name>_merges`: the O(numMerges) merge table (driver-sized by
  *    construction, the same bound [[BpeFit.encode]]'s closure rides);
  *  - `<name>_words`: the encoded word dictionary (word, bpe,
  *    n_tokens), BUCKETED on the word string;
  *  - `<name>_meta`: the bucket count, so appends reuse the spec —
  *
  * and tokenizes each batch with one join: seen words (the Zipf head —
  * effectively all occurrences) ride the bucketed stored table, which
  * never exchanges (plan-asserted in the spec); only the batch's
  * genuinely NEW distinct words (the Zipf tail) replay the merge loop,
  * and with `extend = true` their encodings append into the dictionary
  * under the same bucket spec, so tomorrow's batch finds them seen.
  *
  * Correctness: seen-or-new, every word's symbols come from
  * [[BpeFit.applyMerges]] under the same merge list, so output is
  * row-identical to [[BpeFit.encode]] (spec-asserted), and q79's
  * round-trip oracle semantics carry over unchanged.
  */
object BpeDict {

  private def words(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.bpeishTokens(col(textCol))))
      .select(col("doc_id"), col("pos").as("word_pos"), col("col").as("word"))

  /** Encode one distinct-word frame through the merge loop (the only
    * place symbols are computed — stored and on-the-fly paths share it).
    */
  private def encodeWords(wordsDf: DataFrame,
                          merges: Seq[BpeFit.Merge]): DataFrame = {
    val spark = wordsDf.sparkSession
    import spark.implicits._
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    wordsDf.select(col("word")).as[String].map { w =>
      val bpe = BpeFit.applyMerges(w.map(_.toString), pairs)
      (w, bpe, bpe.length)
    }.toDF("word", "bpe", "n_tokens")
  }

  /** Persist a fitted tokenizer, optionally pre-seeding the word
    * dictionary from a corpus's distinct words (the training corpus,
    * typically — its vocabulary is the Zipf head every future batch
    * re-uses).
    */
  def store(spark: SparkSession, merges: Seq[BpeFit.Merge], name: String,
            seedDocs: Option[(DataFrame, String)] = None,
            buckets: Int = 32): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "count")
      .write.mode("overwrite").saveAsTable(s"${name}_merges")
    val seed = seedDocs match {
      case Some((docs, textCol)) =>
        encodeWords(docs.select(
          explode(graft.functions.TextFunctions.bpeishTokens(col(textCol)))
            .as("word")).distinct(), merges)
      case None =>
        spark.emptyDataset[(String, Seq[String], Int)]
          .toDF("word", "bpe", "n_tokens")
    }
    seed.write.mode("overwrite").bucketBy(buckets, "word").sortBy("word")
      .saveAsTable(s"${name}_words")
    Seq(buckets).toDF("buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  /** The stored merge list — O(numMerges) driver state, the same shape
    * [[BpeFit.encode]] closure-captures.
    */
  def loadMerges(spark: SparkSession, name: String): Seq[BpeFit.Merge] =
    spark.table(s"${name}_merges").collect()
      .map(r => BpeFit.Merge(r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("count")))
      .sortBy(_.rank)

  /** Tokenize a batch against the stored dictionary. Output is
    * [[BpeFit.encode]]'s exact shape: (doc_id, word_pos, word, bpe).
    * Seen words take the bucketed join (stored side exchange-free);
    * unseen words replay the merge loop and join back via broadcast.
    * With `extend`, the new encodings append into `<name>_words` under
    * the stored bucket spec before the result is returned.
    *
    * The novel-word set is COLLECTED (driver-sized local rows, not a
    * session-lifetime cache): against a seeded store it is the batch's
    * Zipf-tail novelty — the construction's whole premise. Seed the
    * store from the training corpus (`store(seedDocs = ...)`) before
    * pointing a cold batch at it; an unseeded store makes the first
    * batch's entire vocabulary "novel" and belongs in `store`, not
    * here.
    */
  def encode(spark: SparkSession, name: String, docs: DataFrame,
             idCol: String, textCol: String,
             extend: Boolean = false): DataFrame = {
    import spark.implicits._
    val w = words(docs, idCol, textCol)
    val dict = spark.table(s"${name}_words")
    val joined = w.join(dict.select(col("word"), col("bpe")), Seq("word"), "left")
    val pairs = loadMerges(spark, name).sortBy(_.rank).map(m => (m.left, m.right))
    val newLocal: Array[(String, Seq[String], Int)] = joined
      .filter(col("bpe").isNull).select(col("word")).distinct()
      .as[String].collect()
      .map { word =>
        val bpe = BpeFit.applyMerges(word.map(_.toString), pairs)
        (word, bpe, bpe.length)
      }
    val newDict = newLocal.toSeq.toDF("word", "bpe", "n_tokens")
    if (extend && newLocal.nonEmpty) {
      val buckets = spark.table(s"${name}_meta").head().getInt(0)
      newDict.write.mode("append").bucketBy(buckets, "word").sortBy("word")
        .saveAsTable(s"${name}_words")
    }
    // BOTH legs derive from `joined`'s null partition: whether the
    // table relation snapshots its file list at analysis (today's
    // behavior) or re-lists after the extend append, each word
    // occurrence is emitted exactly once — a re-list moves novel
    // occurrences from the fresh leg to the seen leg, never into both
    // (spec-asserted as a multiset, not a set).
    val seen = joined.filter(col("bpe").isNotNull)
      .select(col("doc_id"), col("word_pos"), col("word"), col("bpe"))
    val fresh = joined.filter(col("bpe").isNull).drop("bpe")
      .join(broadcast(newDict.select(col("word"), col("bpe"))), Seq("word"))
      .select(col("doc_id"), col("word_pos"), col("word"), col("bpe"))
    seen.unionByName(fresh)
  }
}
