package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer fitting (Kudo 2018) — the
  * second tokenizer family next to [[BpeFit]]: instead of greedy
  * merges, keep a piece vocabulary with probabilities, fit by EM over
  * all segmentations, and segment by Viterbi. What it buys over BPE:
  * probabilistic segmentation (sampling/regularization) and a
  * principled prune order; what this implementation pins down is the
  * DISTRIBUTED shape and cross-engine determinism.
  *
  * Scale design (the [[BpeFit]] discipline):
  *
  *  - the corpus is touched ONCE ([[wordFreq]]: pre-tokenize +
  *    groupBy-sum on the word string). Everything after runs over the
  *    distinct-word contraction (~10⁸ rows at 100 TB — distributed,
  *    never driver state).
  *  - [[candidates]] explodes each distinct word into its substrings
  *    ≤ maxLen (weighted by word count) — one flatMap + one hash
  *    aggregate; the seed vocabulary is the top-K multi-char pieces
  *    under the total order (count desc, piece asc) plus EVERY single
  *    character (coverage guarantee). Global top-K is
  *    TakeOrderedAndProject.
  *  - each EM round is one distributed pass over the word table with
  *    the vocab BROADCAST (model-sized, like [[BpeDict]]): per word,
  *    forward-backward over the segmentation lattice yields expected
  *    piece counts, QUANTIZED per word to micro-unit longs — summing
  *    longs is order/partitioning-independent, so the fit is
  *    bit-reproducible on any cluster (the double-summation
  *    nondeterminism the naive E-step would have).
  *  - pruning keeps singles + the top multi-char pieces by expected
  *    count under the same total order; probabilities are derived
  *    from the long micro counts (one deterministic division each).
  *  - the fitted vocab is O(vocab) driver state — the model artifact,
  *    exactly like the BPE merge list.
  *
  * [[viterbi]] segmentation is per-word deterministic (fixed scan
  * order, log-prob compare with a fewer-pieces then lexicographic
  * tie-break) and rides the same dictionary contraction at encode
  * time: the merge loop runs once per DISTINCT word, documents join
  * the encoded dictionary by word.
  */
object UnigramLM {

  /** The fitted model: pieces with expected-count micro masses and
    * the derived log-probs. Singles cover every seen character. */
  final case class Vocab(pieces: Map[String, Double], maxLen: Int) {
    /** log prob; unseen pieces get -inf (never proposed by the
      * lattice builder except the unknown-char fallback). */
    @inline def logp(p: String): Double = pieces.get(p) match {
      case Some(pr) => math.log(pr)
      case None     => UnknownLogp
    }
  }

  /** Fallback log-prob for characters never seen in the fit corpus —
    * worse than any fitted piece so Viterbi only uses it when forced. */
  val UnknownLogp: Double = -1e9

  /** One corpus pass: distinct words with counts. Same pre-tokenizer
    * as the whole text family (q25/BPE convention). */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.functions.TextFunctions.bpeishTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  /** Seed-candidate counts: every substring of length 1..maxLen of
    * every distinct word, weighted by the word's corpus count. Returns
    * the FULL (piece, count) table (contraction-sized); callers take
    * the head under (count desc, piece). */
  def candidateCounts(wordFreq: DataFrame, maxLen: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    wordFreq.as[(String, Long)].flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxLen, w.length - i)
      } yield (w.substring(i, i + l), c)
    }.toDF("piece", "c")
      .groupBy(col("piece")).agg(sum(col("c")).as("count"))
  }

  /** Seed vocabulary: all single characters + the top `topMulti`
    * multi-char pieces with count ≥ minCount, probabilities ∝ counts.
    */
  def seedVocab(wordFreq: DataFrame, maxLen: Int, topMulti: Int,
                minCount: Long = 2L): Vocab = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val cc = candidateCounts(wordFreq, maxLen).localCheckpoint()
    val singles = cc.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val multis = cc.filter(length(col("piece")) >= 2 && col("count") >= minCount)
      .orderBy(col("count").desc, col("piece"))
      .limit(topMulti)
      .as[(String, Long)].collect()
    fromCounts((singles ++ multis).toMap, maxLen)
  }

  private def fromCounts(counts: Map[String, Long], maxLen: Int): Vocab = {
    val total = counts.values.map(BigInt(_)).sum
    require(total > 0, "empty candidate set")
    val t = total.toDouble
    Vocab(counts.map { case (p, c) => p -> (c.toDouble / t) }, maxLen)
  }

  /** Per-word expected piece counts under `vocab` (forward-backward
    * over the segmentation lattice), quantized to micro-units and
    * scaled by the word's corpus count. Pure function of (word,
    * vocab) — the determinism anchor. Returns empty when the word has
    * no full segmentation (impossible once singles cover the
    * alphabet; unseen chars contribute via the unknown fallback).
    */
  private[operators] def expectedCounts(w: String, c: Long,
                                        vocab: Vocab): Seq[(String, Long)] = {
    val n = w.length
    if (n == 0) return Nil
    val L = vocab.maxLen
    // log-space forward/backward with logsumexp
    @inline def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    def pieceLogp(i: Int, j: Int): Double = {
      val p = w.substring(i, j)
      if (j - i == 1) vocab.pieces.get(p).map(math.log)
        .getOrElse(UnknownLogp) // single-char fallback keeps the lattice connected
      else vocab.pieces.get(p).map(math.log).getOrElse(Double.NegativeInfinity)
    }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (j <- 1 to n; i <- math.max(0, j - L) until j) {
      val lp = pieceLogp(i, j)
      if (lp > Double.NegativeInfinity && alpha(i) > Double.NegativeInfinity)
        alpha(j) = lse(alpha(j), alpha(i) + lp)
    }
    if (alpha(n) == Double.NegativeInfinity) return Nil
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    beta(n) = 0.0
    for (i <- (n - 1) to 0 by -1; j <- (i + 1) to math.min(n, i + L)) {
      val lp = pieceLogp(i, j)
      if (lp > Double.NegativeInfinity && beta(j) > Double.NegativeInfinity)
        beta(i) = lse(beta(i), lp + beta(j))
    }
    val z = alpha(n)
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    for (i <- 0 until n; j <- (i + 1) to math.min(n, i + L)) {
      val lp = pieceLogp(i, j)
      if (lp > Double.NegativeInfinity &&
          alpha(i) > Double.NegativeInfinity && beta(j) > Double.NegativeInfinity) {
        val e = math.exp(alpha(i) + lp + beta(j) - z)
        if (e > 0) {
          val p = w.substring(i, j)
          acc(p) = acc.getOrElse(p, 0.0) + e
        }
      }
    }
    // quantize BEFORE the cross-word sum: long addition is
    // order-independent, double addition is not
    acc.iterator.map { case (p, e) =>
      p -> math.rint(e * c * 1e6).toLong
    }.filter(_._2 > 0L).toSeq
  }

  /** One EM round: distributed E-step over the word table (vocab
    * broadcast via closure), M-step = the long micro-count sums
    * renormalized.
    *
    * The collect is vocabulary+alphabet-bounded by construction today
    * — the lattice only credits pieces already in `vocab` plus the
    * unknown-single-char fallback, so the aggregated table has
    * ≤ |vocab| + |alphabet| rows regardless of corpus size.
    * `maxPieces` pins that invariant loudly (the [[Skyline]] guard
    * convention): a future lattice change that started emitting
    * arbitrary substrings would fail here with a count, never
    * silently grow the driver collect toward corpus scale.
    */
  def emRound(wordFreq: DataFrame, vocab: Vocab,
              maxPieces: Long = 2000000L): Map[String, Long] = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val agg = wordFreq.as[(String, Long)]
      .flatMap { case (w, c) => expectedCounts(w, c, vocab) }
      .toDF("piece", "e_micro")
      .groupBy(col("piece")).agg(sum(col("e_micro")).as("e"))
      .localCheckpoint()
    val n = agg.count()
    require(n <= maxPieces,
      s"emRound produced $n distinct pieces (> maxPieces=$maxPieces) — " +
        "the E-step must stay vocab+alphabet-bounded before it may " +
        "collect to the driver")
    agg.as[(String, Long)].collect().toMap
  }

  /** Fit: seed → (EM → prune) rounds → final EM-weighted vocab with
    * `vocabMulti` multi-char pieces (singles always kept). Each round
    * is ONE distributed pass; the prune keeps the top pieces by
    * (expected count desc, piece asc) — total order, deterministic.
    */
  def fit(wordFreq: DataFrame, maxLen: Int = 8, vocabMulti: Int = 256,
          emRounds: Int = 2, seedFactor: Int = 3,
          minCount: Long = 2L): Vocab = {
    val (counts, ml) = fitCounts(wordFreq, maxLen, vocabMulti, emRounds,
      seedFactor, minCount)
    fromCounts(counts, ml)
  }

  /** [[fit]]'s integer basis: the final kept micro-count table — what
    * [[store]] persists, so a reloaded vocab is BIT-identical to the
    * fit (probabilities re-derive from the same longs). */
  def fitCounts(wordFreq: DataFrame, maxLen: Int = 8, vocabMulti: Int = 256,
                emRounds: Int = 2, seedFactor: Int = 3,
                minCount: Long = 2L): (Map[String, Long], Int) = {
    var vocab = seedVocab(wordFreq, maxLen, vocabMulti * seedFactor, minCount)
    var counts = Map.empty[String, Long]
    val wf = wordFreq.localCheckpoint()
    for (r <- 1 to emRounds) {
      val e = emRound(wf, vocab)
      val singles = e.filter(_._1.length == 1)
      val keepMulti =
        if (r == emRounds) vocabMulti
        else math.max(vocabMulti, (e.size - singles.size) * 3 / 4)
      val multis = e.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, cnt) => (-cnt, p) }.take(keepMulti)
      // singles never prune: they are the coverage floor
      counts = singles ++ multis
      vocab = fromCounts(counts, maxLen)
    }
    (counts, maxLen)
  }

  /** Persist a fitted tokenizer under the stored-model convention
    * (NgramLM / BpeDict / Drift): `<name>_pieces` holds the integer
    * micro-count basis, `<name>_meta` the maxLen — reload re-derives
    * the identical probabilities from the identical longs. */
  def store(spark: SparkSession, counts: Map[String, Long], maxLen: Int,
            name: String): Unit = {
    import spark.implicits._
    counts.toSeq.toDF("piece", "e_micro")
      .write.mode("overwrite").saveAsTable(s"${name}_pieces")
    Seq(maxLen).toDF("max_len").write.mode("overwrite")
      .saveAsTable(s"${name}_meta")
  }

  def load(spark: SparkSession, name: String): Vocab = {
    import spark.implicits._
    val counts = spark.table(s"${name}_pieces")
      .as[(String, Long)].collect().toMap
    val maxLen = spark.table(s"${name}_meta").head().getInt(0)
    fromCounts(counts, maxLen)
  }

  /** Viterbi segmentation: maximize Σ log p(piece); ties break on
    * FEWER pieces, then the lexicographically smaller piece at the
    * latest divergence — total, engine-reproducible. Unknown chars
    * ride the single-char fallback. */
  def viterbi(w: String, vocab: Vocab): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val L = vocab.maxLen
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bestLen = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0; bestLen(0) = 0
    for (j <- 1 to n; i <- math.max(0, j - L) until j) {
      val p = w.substring(i, j)
      val lp =
        if (j - i == 1) vocab.pieces.get(p).map(math.log).getOrElse(UnknownLogp)
        else vocab.pieces.get(p).map(math.log).getOrElse(Double.NegativeInfinity)
      if (lp > Double.NegativeInfinity && best(i) > Double.NegativeInfinity) {
        val cand = best(i) + lp
        val candLen = bestLen(i) + 1
        val better = cand > best(j) ||
          (cand == best(j) && (candLen < bestLen(j) ||
            (candLen == bestLen(j) && back(j) >= 0 &&
              p < w.substring(back(j), j))))
        if (better) { best(j) = cand; bestLen(j) = candLen; back(j) = i }
      }
    }
    val out = List.newBuilder[String]
    var j = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (j > 0) { val i = back(j); rev += w.substring(i, j); j = i }
    rev.reverseIterator.foreach(out += _)
    out.result()
  }

  /** Encode a corpus via the dictionary contraction: Viterbi once per
    * DISTINCT word, docs join back by word. Output per doc:
    * `(doc_id, n_words, n_pieces, chars_covered, pass)` with `pass`
    * the round-trip identity (every word's pieces concatenate back to
    * the word — asserted inside the segmenter per distinct word, then
    * aggregated). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Vocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.bpeishTokens(col(textCol))).as("word"))
    val dict = words.select(col("word")).distinct().as[String]
      .map { w =>
        val pieces = viterbi(w, vocab)
        (w, pieces.length.toLong, pieces.mkString("") == w)
      }.toDF("word", "n_pieces_w", "rt_w")
    words.join(dict, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces_w")).as("n_pieces"),
        sum(when(col("rt_w"), 1L).otherwise(0L)).as("n_roundtrip"))
      .withColumn("pass", col("n_roundtrip") === col("n_words"))
  }
}
