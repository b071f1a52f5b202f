package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout control for curated corpora — at 100 TB the WRITE
  * layout is a query-plan decision: hive-style partitions make
  * downstream slice scans (one lang, one split) partition-pruned;
  * bucketing by doc_id makes every later doc-id join (dedup fetches,
  * span lookups, incremental admission) exchange-free on the stored
  * side; `maxRecordsPerFile` bounds file sizes so a skewed partition
  * can't produce multi-GB files (the small-files/huge-files tradeoff
  * is explicit, not accidental).
  *
  * This is the terminal sink of the curation pipeline: what q49
  * decides, this writes.
  */
object CorpusLayout {

  /** Write `df` as a partitioned + bucketed + sorted managed table.
    * `partitionCols` must be low-cardinality (lang, source, split);
    * `bucketCol` the join key downstream reads use.
    */
  def writeCurated(df: DataFrame, table: String,
                   partitionCols: Seq[String], bucketCol: String,
                   buckets: Int = 32, maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** A pruned slice read: only the matching partitions' files are
    * listed/scanned (assert via plan PartitionFilters).
    */
  def readSlice(spark: SparkSession, table: String,
                partitionCol: String, value: String): DataFrame =
    spark.table(table).filter(col(partitionCol) === value)
}
