package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a stored table — the lakehouse write
  * pattern the reference's config/ledger stores do row-at-a-time
  * (`common.js` dynamoDB putItem/updateItem upserts,
  * `processedFiles.js` re-injection) re-expressed as a set operation
  * an engine can run over billions of rows: a batch of updates
  * replaces the stored rows sharing its keys, inserts the rest, and
  * everything else survives untouched.
  *
  * Two exact formulations, both shuffle-minimal:
  *
  *  - `upsert` (batch-wins): `updates ∪ (stored ⟕̸ updateKeys)` — one
  *    anti-join on the key. The batch is authoritative; no version
  *    column needed. Duplicate keys WITHIN the batch are the caller's
  *    contract to resolve first (assertable via `requireUniqueKeys`).
  *  - `upsertLatest` (version-wins): union both sides and keep, per
  *    key, the row with the greatest (version, tieBreak) — survives
  *    out-of-order delivery where a stale update must NOT clobber a
  *    newer stored row. One hash aggregation via max_by-style struct
  *    ordering, no window.
  *
  * Scale design (100 TB stored / small batches): with the stored side
  * saved bucketed on the key ([[upsertStored]] preserves the layout,
  * the [[DedupIndex]]/[[Bm25Index]] convention), the anti-join reads
  * the stored table without an exchange and only the batch shuffles;
  * the rewrite cost is bounded by touched buckets on engines with
  * bucket-level replace (whole-table rewrite here — Spark's managed-
  * table granularity — but the PLAN stays exchange-free on the big
  * side, which is what survives a 100× scale-up).
  */
object StoredMerge {

  /** Batch-wins upsert: every stored row whose key appears in
    * `updates` is replaced; other stored rows pass through; new keys
    * insert. Column sets must match (positional-safe via unionByName).
    */
  def upsert(stored: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    updates.unionByName(
      stored.join(keys, keyCols, "left_anti"))
  }

  /** Version-wins upsert: per key keep the single row with the
    * greatest (`versionCol`, `tieBreak`) across stored ∪ updates —
    * stale updates lose to newer stored rows. `tieBreak` must make
    * the order total within a key (e.g. a side marker or unique id);
    * ties on the full pair would otherwise pick an arbitrary winner.
    * One map-side-partial max_by aggregate on the key — no window,
    * no sort, skew-immune.
    */
  def upsertLatest(stored: DataFrame, updates: DataFrame, keyCols: Seq[String],
                   versionCol: String, tieBreak: String): DataFrame = {
    val all = stored.unionByName(updates)
    val dataCols = all.columns.filterNot(keyCols.contains)
    val packed = struct((Seq(versionCol, tieBreak).map(col) ++
      dataCols.filterNot(Seq(versionCol, tieBreak).contains).map(col)): _*)
    all.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__w"))
      .select(keyCols.map(col) ++ dataCols.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Guard for [[upsert]]'s in-batch contract: fails fast if the batch
    * carries duplicate keys (which would double-insert).
    */
  def requireUniqueKeys(updates: DataFrame, keyCols: Seq[String]): Unit = {
    val dups = updates.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
    require(dups == 0, s"updates carry duplicate keys on ${keyCols.mkString(",")}")
  }

  /** Merge `updates` into the managed table `table` (batch-wins) and
    * write the result back under the SAME bucketed-on-key layout, so
    * the next merge's anti-join again reads the stored side
    * exchange-free. Writes via a temp table + rename-by-rewrite
    * (Spark managed tables can't self-overwrite mid-read).
    */
  def upsertStored(spark: SparkSession, table: String, updates: DataFrame,
                   keyCols: Seq[String], buckets: Int = 32): Unit = {
    val merged = upsert(spark.table(table), updates, keyCols)
    val tmp = s"${table}__merge_tmp"
    merged.write.mode("overwrite")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    // rename preserves the bucket spec — one write, no second rewrite
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }
}
