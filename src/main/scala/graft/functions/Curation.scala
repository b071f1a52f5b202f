package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation column builders a training-data pipeline runs before
  * anything touches a tokenizer: PII scrubbing and deterministic
  * train/val/test split assignment.
  *
  * Everything here is composed from codegen'd built-ins (`functions._`)
  * — no UDFs — so the ops fold into whole-stage codegen and run
  * scan-adjacent with zero shuffle: at 100 TB both redaction and split
  * assignment are pure map work whose cost is the scan itself.
  */
object Curation {

  // -------------------------------------------------------------------
  // PII redaction (C4/Dolma-style scrubbing pass).
  //
  // Patterns stay inside the POSIX-class subset shared by Java regex
  // and RE2 so the same pattern text runs identically in Spark and in
  // external engines (the oracle relies on this).
  // -------------------------------------------------------------------

  /** Email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (loose — no octet range check, like C4's scrubber). */
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** US-SSN-shaped government id: 3-2-4 digit groups. */
  val GovIdRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def countMatches(c: Column, re: String): Column =
    regexp_count(c, lit(re)).cast("long")

  /** Scrub the three PII families, replacing each hit with a typed mask
    * token. Order matters and is part of the contract: emails first
    * (an all-digit local part could otherwise half-match the IP
    * pattern), then ids (no dots — can't collide with what's left),
    * then IPs.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        GovIdRe, "<ID>"),
      Ipv4Re, "<IP>")

  // -------------------------------------------------------------------
  // Deterministic split assignment (reproducible sampling).
  //
  // The split of a document is a pure function of (salt, key): stable
  // across re-runs, cluster sizes, partitionings and engines — the
  // property a train/test split must have so no document ever migrates
  // between splits when the corpus is re-processed. Bucketing uses the
  // first two hex chars of md5 (256 buckets) decoded with pure string
  // ops, so any engine with md5 + strpos reproduces it bit-for-bit.
  // -------------------------------------------------------------------

  /** Stable bucket in [0, 256) from md5(salt:key): the first two hex
    * chars decoded base-16 (Spark `conv`; an external engine reproduces
    * it with strpos arithmetic over "0123456789abcdef").
    */
  def hashBucket256(key: Column, salt: String): Column = {
    val h = md5(concat(lit(salt + ":"), key.cast("string")).cast("binary"))
    conv(substring(h, 1, 2), 16, 10).cast("int")
  }

  /** Data-recipe epoch expansion — the source-upsampling pass of a
    * pretraining mixture (wiki ×2.5, web ×1, code ×0.5 …): emit one
    * row per (doc, epoch) instance. Epoch factors are FIXED-POINT in
    * 1/256ths (`epochs256 = 640` ⇒ 2.5 epochs): every doc gets
    * `epochs256 div 256` full copies, plus one more iff its
    * [[hashBucket256]] < `epochs256 mod 256` — so fractional epochs
    * (and sub-1 downsampling) are exact in expectation, deterministic
    * per document, and engine-reproducible (no RNG, no float rate;
    * q41/q53's arithmetic). Pure scan-level work: one broadcast join
    * of the (tiny) recipe + a closed-form explode.
    *
    * Sources absent from the recipe take `defaultEpochs256` (default
    * 256 = ×1, pass-through); pass 0 to drop unlisted sources. A
    * partial recipe therefore never silently shrinks the corpus.
    */
  def epochExpand(docs: DataFrame, idCol: String, sourceCol: String,
                  epochs256: Map[String, Int],
                  salt: String = "epoch",
                  defaultEpochs256: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions.broadcast
    val recipe = spark.createDataFrame(
        epochs256.toSeq.map { case (s, e) => (s, e / 256, e % 256) })
      .toDF(sourceCol, "__full", "__rem")
    docs.join(broadcast(recipe), Seq(sourceCol), "left")
      .withColumn("__full", coalesce(col("__full"), lit(defaultEpochs256 / 256)))
      .withColumn("__rem", coalesce(col("__rem"), lit(defaultEpochs256 % 256)))
      .withColumn("__n", col("__full") +
        when(hashBucket256(col(idCol), salt) < col("__rem"), 1).otherwise(0))
      // guard the zero-copy case: Spark's sequence(1, 0) yields a
      // DESCENDING [1, 0], not empty — downsampled docs must vanish
      .withColumn("epoch_no", explode(
        when(col("__n") >= 1, sequence(lit(1), col("__n")))
          .otherwise(array().cast("array<int>"))))
      .drop("__full", "__rem", "__n")
  }

  /** Split label from cumulative per-256 bucket thresholds, e.g.
    * trainUpto=230, valUpto=243 → ~89.8% / ~5.1% / ~5.1%.
    */
  def splitAssign(key: Column, salt: String = "split",
                  trainUpto: Int = 230, valUpto: Int = 243): Column = {
    val b = hashBucket256(key, salt)
    when(b < trainUpto, lit("train"))
      .when(b < valUpto, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic within-corpus shuffle key: md5(salt:key) hex.
    * Lowercase hex sorts identically everywhere (q47's convention), so
    * ordering by it is an engine-reproducible random permutation — the
    * training-order randomization a data-loader shard write needs,
    * with no RNG and no global row numbering.
    */
  def shuffleKey(key: Column, salt: String = "shuffle"): Column =
    md5(concat(lit(salt + ":"), key.cast("string")).cast("binary"))

  /** Deterministic shard assignment in [0, nShards): [[hashBucket256]]
    * mod nShards (nShards ≤ 256). Hash-bucketed, NOT rank-balanced —
    * a global row_number would serialize the corpus through one
    * partition; bucket counts concentrate within O(√(n/256)) of even
    * anyway. The shard write is `partitionBy(shard)` +
    * `sortWithinPartitions(shuffleKey)`: shuffled order, bounded
    * memory, no global sort.
    */
  def shardAssign(key: Column, nShards: Int,
                  salt: String = "shuffle"): Column = {
    require(nShards >= 1 && nShards <= 256, s"nShards in [1,256]: $nShards")
    pmod(hashBucket256(key, salt), lit(nShards))
  }

  // -------------------------------------------------------------------
  // Text normalization — the pass every pipeline runs before anything
  // hashes, shingles or tokenizes, so dedup keys are whitespace- and
  // control-char-independent.
  // -------------------------------------------------------------------

  /** C0/C1 control characters except tab/newline/CR (which the
    * whitespace collapse handles). Both Java regex and RE2 accept this
    * class syntax.
    */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Normalize: strip control chars, collapse all whitespace runs to
    * one space, trim. Idempotent; pure map work.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, ControlRe, ""), "[ \\t\\n\\r]+", " "))

  // -------------------------------------------------------------------
  // Linear quality-classifier inference (the fastText/logreg-filter
  // shape used by GPT-3/LLaMA curation: hashed bag-of-words × weight
  // vector → per-document margin). The weight of a token is a pure
  // deterministic function of its hash bucket, standing in for a
  // learned vector: the plumbing under grade-out — per-token bucket
  // lookup folded into a per-document reduce with zero shuffle — is
  // exactly what a real hashed linear model runs at 100 TB; swapping
  // in trained weights replaces `tokenWeight` with a broadcast
  // bucket→weight array and nothing else moves.
  // -------------------------------------------------------------------

  /** Signed integer weight in [-128, 127] from the token's 256-way
    * hash bucket (engine-reproducible: md5 + hex arithmetic).
    */
  def tokenWeight(t: Column, salt: String = "clf"): Column =
    hashBucket256(t, salt) - 128

  /** Per-document classifier margin: Σ tokenWeight over whitespace
    * tokens. Integer-exact, HOF-composed (one codegen'd pass over the
    * token array — the groupBy-free shape; no explode, no shuffle).
    */
  def classifierMargin(c: Column, salt: String = "clf"): Column =
    aggregate(TextFunctions.tokens(c), lit(0L),
      (acc, t) => acc + tokenWeight(t, salt).cast("long"))

  // -------------------------------------------------------------------
  // Intra-document paragraph dedup — the sub-document pass that strips
  // boilerplate repeated WITHIN one page (nav blocks, repeated footers)
  // before any corpus-wide dedup runs. Purely per-document: array ops
  // inside whole-stage codegen, zero shuffle at any scale.
  // -------------------------------------------------------------------

  /** Drop repeated paragraphs keeping the first occurrence (Spark's
    * `array_distinct` preserves first-occurrence order) and rejoin.
    */
  def dedupParagraphs(c: Column, delim: String = "\n"): Column =
    array_join(array_distinct(split(c, java.util.regex.Pattern.quote(delim))), delim)
}
