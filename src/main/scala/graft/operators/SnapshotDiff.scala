package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot differencing — classify every key across two table
  * versions as `added` / `removed` / `changed` / `unchanged`: the
  * change-data-capture complement to [[StoredMerge]] (the reference
  * mutates config/ledger rows in place — `index.js` updateConfig /
  * batch state transitions; this is the engine-side set form that
  * AUDITS two states instead of producing one).
  *
  * Scale design (100 TB): one full-outer hash join on the key columns
  * — both sides shuffle exactly once on the key; comparison columns
  * ride the join row, compared null-safely (`<=>`), no window, no
  * collect. The summary is a map-side-partial count rollup.
  */
object SnapshotDiff {

  /** Per-key classification. Output: the key columns + `change_type`
    * (`added` = key only in `next`, `removed` = key only in `prev`,
    * `changed` = present in both with any compare column differing
    * null-safely, `unchanged`). Compare columns must exist on both
    * sides.
    */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val p = prev.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_prev", lit(1))
    val n = next.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_next", lit(1))
    val pc = compareCols.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"__p_$c"))
    val nc = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    val joined = pc.join(nc, keys, "full_outer")
    val anyDiff = compareCols
      .map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    joined.select(keys.map(col) :+
      when(col("__in_prev").isNull, lit("added"))
        .when(col("__in_next").isNull, lit("removed"))
        .when(anyDiff, lit("changed"))
        .otherwise(lit("unchanged")).as("change_type"): _*)
  }

  /** Roll-up of [[diff]]: one row per change_type with its key count
    * (all four types present with count 0 absent — downstream joins
    * should left-join a type dimension if they need dense rows).
    */
  def summary(prev: DataFrame, next: DataFrame, keys: Seq[String],
              compareCols: Seq[String]): DataFrame =
    diff(prev, next, keys, compareCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"))

  /** CHECKSUM-SCOPED diff — the 100 TB shape of [[diff]]: when two
    * states agree on almost everything (the daily-sync norm), the
    * full-outer join still shuffles BOTH tables end to end. Instead:
    *
    *  1. [[Fingerprint.checksumBy]] both sides on a deterministic
    *     key-hash bucket — one scan + one tiny aggregate each, nothing
    *     wide moves;
    *  2. buckets whose (count, checksum) agree are PROVEN identical
    *     (60-bit signatures; see Fingerprint's collision note) and
    *     never join;
    *  3. only rows of disagreeing buckets enter [[diff]]'s full-outer
    *     join — cost proportional to the CHANGE VOLUME, not the table.
    *
    * Exactness is not traded: the spec pins scoped ≡ full diff on the
    * changed rows, and agreeing buckets contribute only `unchanged`
    * rows by the checksum argument, which the summary reconstitutes
    * arithmetically (`n_unchanged = total_keys − classified`). Returns
    * the [[diff]] rows of disagreeing buckets plus the reconstituted
    * unchanged count, as `(change_type, n_keys)` — identical to
    * [[summary]]'s contract, dense in all four types.
    */
  def summaryByBuckets(prev: DataFrame, next: DataFrame, keys: Seq[String],
                       compareCols: Seq[String], nBuckets: Int): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val bucket = pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
    val sig = keys.map(col) ++ compareCols.map(col)
    val cp = Fingerprint.checksumBy(prev, bucket, sig)
    val cn = Fingerprint.checksumBy(next, bucket, sig)
    val hot = Fingerprint.diffChecksums(cp, cn)
      .select(col("bucket")).distinct()
    // only rows whose bucket disagrees reach the wide join; the
    // broadcast of the ≤ nBuckets hot list prunes both scans
    val pHot = prev.withColumn("__b", bucket)
      .join(broadcast(hot.withColumnRenamed("bucket", "__b")), Seq("__b"))
      .drop("__b")
    val nHot = next.withColumn("__b", bucket)
      .join(broadcast(hot.withColumnRenamed("bucket", "__b")), Seq("__b"))
      .drop("__b")
    val classified = diff(pHot, nHot, keys, compareCols)
      .groupBy(col("change_type")).agg(count(lit(1)).as("n_keys"))
    // agreeing buckets are all-unchanged: reconstitute their count
    // from the checksum pass (total next-side keys − hot next-side
    // keys), so the output equals summary()'s exactly
    val totalNext = cn.agg(coalesce(sum(col("n_rows")), lit(0L)).as("t"))
    val hotNext = cn.join(hot, Seq("bucket"))
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("h"))
    val coldUnchanged = totalNext.crossJoin(hotNext)
      .select(lit("unchanged").as("change_type"),
        (col("t") - col("h")).as("n_keys"))
    val spark = prev.sparkSession
    import spark.implicits._
    val types = Seq("added", "removed", "changed", "unchanged")
      .toDF("change_type")
    types.join(classified.unionByName(coldUnchanged), Seq("change_type"), "left")
      .groupBy(col("change_type"))
      .agg(coalesce(sum(col("n_keys")), lit(0L)).as("n_keys"))
  }
}
