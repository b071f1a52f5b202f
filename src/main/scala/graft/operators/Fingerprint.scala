package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent content checksums — the cheap "did anything
  * change, and WHERE" primitive for incremental sync, replication
  * audit, and merge verification (the reference's ledger answers
  * "which files were processed" by keyed lookup; this answers "do two
  * table states agree" without moving either state).
  *
  * A row's signature is the first 60 bits of `md5(canonical row
  * string)`, parsed as an integer — md5 hex is byte-identical across
  * engines, so signatures (and everything folded from them) replay
  * exactly in any system with md5 and hex parsing. Checksums fold
  * signatures with SUM over a group (bucket): commutative and
  * associative, so the fold is order/partitioning-independent and
  * MERGEABLE — per-shard checksums add up to the table checksum,
  * the sketch-family discipline applied to equality testing.
  *
  * Scale shape: one column-pruned scan + one hash aggregate on the
  * bucket key; nothing else moves. Comparing two 100 TB states costs
  * two independent scans + a join of two (nBuckets)-row tables; only
  * buckets whose checksums disagree need row-level diffing
  * ([[SnapshotDiff]] scoped to the touched buckets — and
  * [[StoredMerge.upsertBuckets]]'s untouched-bucket guarantee can be
  * AUDITED with exactly this: untouched buckets must keep their
  * checksum, spec-pinned).
  *
  * Collision honesty: SUM of 60-bit signatures detects any single-row
  * change with certainty and random corruption with probability
  * ~1−2^−60 per bucket; an adversarial collision is out of scope (use
  * a cryptographic tree for that).
  */
object Fingerprint {

  /** 60-bit integer signature of a canonical row string: the caller
    * picks (and canonicalizes) the columns — integers/strings/dates
    * render identically across engines; pre-scale floats
    * ([[Regression.centiUnits]]). Fields join on the \u0001 separator
    * with NULL rendered as the \u0000 sentinel (NUL — distinct from the
    * empty string, so a NULL↔'' edit changes the signature), hence
    * `("a", null)` ≠ `("a", "")` ≠ `("", "a")` ≠ `("a",)` — no
    * concatenation collisions across field boundaries (engines replay
    * via `concat_ws(chr(1), coalesce(c, chr(0)), ...)`; values are
    * assumed free of the two control chars, the usual concat_ws
    * contract).
    */
  def rowSignature(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)), 1, 15),
      16, 10).cast("long")

  /** Per-bucket content checksum: `(bucket, n_rows, checksum)`.
    * `bucketCol` is any deterministic grouping expression (a key
    * range, a hash bucket, a partition column). The checksum is the
    * signature SUM in DECIMAL(38,0) (no overflow at any row count),
    * reduced mod 2^61 into a BIGINT.
    */
  def checksumBy(df: DataFrame, bucketCol: Column,
                 sigCols: Seq[Column]): DataFrame =
    df.groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowSignature(sigCols).cast("decimal(38,0)")).as("__sum"))
      .withColumn("checksum",
        pmod(col("__sum"), lit(2305843009213693952L).cast("decimal(38,0)"))
          .cast("long"))
      .drop("__sum")

  /** Whole-table checksum — the buckets folded once more (mergeable:
    * equals checksumming with a constant bucket).
    */
  def tableChecksum(df: DataFrame, sigCols: Seq[Column]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(rowSignature(sigCols).cast("decimal(38,0)")).as("__sum"))
      .withColumn("checksum",
        pmod(col("__sum"), lit(2305843009213693952L).cast("decimal(38,0)"))
          .cast("long"))
      .drop("__sum")

  /** Compare two bucketed checksum tables: one row per bucket that
    * DISAGREES (missing on a side counts as disagreeing). The output
    * is the row-level diff's work list.
    */
  def diffChecksums(a: DataFrame, b: DataFrame): DataFrame = {
    val left = a.select(col("bucket"), col("n_rows").as("n_rows_a"),
      col("checksum").as("checksum_a"))
    val right = b.select(col("bucket"), col("n_rows").as("n_rows_b"),
      col("checksum").as("checksum_b"))
    left.join(right, Seq("bucket"), "full_outer")
      .filter(col("checksum_a").isNull || col("checksum_b").isNull ||
        col("checksum_a") =!= col("checksum_b") ||
        col("n_rows_a") =!= col("n_rows_b"))
  }
}
