package graft.ledger

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Durable, queryable batch + processed-file ledger — the Spark-native
  * replacement for the reference's three DynamoDB tables
  * (`/root/reference/common.js:130-226`). Event-sourced: every state
  * change is an appended parquet row; "current state" is the
  * latest-event-per-key view. This keeps writes append-only (no
  * compare-and-swap needed — the streaming pipeline is the single
  * writer) while giving ops the full history the reference scatters
  * across `previousBatches` / `clusterLoadStatus` attributes.
  *
  * Scale: the log partitions by `event_date`, so ops queries prune to
  * the window they ask about; the latest-state window function shuffles
  * only the (small) control-plane log, never user data.
  */
final case class BatchLedgerEvent(
    s3Prefix: String,
    batchId: String,
    status: String,
    entryFiles: Seq[String],
    entrySizes: Seq[Long],
    sizeBytes: Long,
    manifestFile: String,
    targetStatus: Map[String, String],
    errorMessage: String,
    updateReason: String,
    lastUpdate: Long,
    eventDate: java.sql.Date)

final case class FileLedgerEvent(
    loadFile: String,
    receiveDateTime: Long,
    timesReceived: Int,
    batchId: String,
    previousBatches: Seq[String],
    eventDate: java.sql.Date)

class Ledger(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val batchDir = s"$dir/batches"
  private val fileDir = s"$dir/files"

  private def today(ts: Long) = new java.sql.Date(ts - ts % 86400000L)

  def appendBatch(rec: BatchRecord, reason: String = ""): Unit = {
    val ev = BatchLedgerEvent(
      rec.s3Prefix, rec.batchId, rec.status,
      rec.entries.map(_.file), rec.entries.map(_.size), rec.sizeBytes,
      rec.manifestFile.getOrElse(""), rec.targetStatus,
      rec.errorMessage.getOrElse(""), if (reason.nonEmpty) reason else rec.updateReason.getOrElse(""),
      rec.lastUpdate, today(rec.lastUpdate))
    Seq(ev).toDS().write.mode(SaveMode.Append).partitionBy("eventDate").parquet(batchDir)
  }

  def appendFile(ev: ProcessedFile, atMs: Long): Unit =
    Seq(FileLedgerEvent(ev.loadFile, ev.receiveDateTime, ev.timesReceived,
      ev.batchId.getOrElse(""), ev.previousBatches, today(atMs)))
      .toDS().write.mode(SaveMode.Append).partitionBy("eventDate").parquet(fileDir)

  def batchLog: Dataset[BatchLedgerEvent] =
    try spark.read.parquet(batchDir).as[BatchLedgerEvent]
    catch { case _: Throwable => spark.emptyDataset[BatchLedgerEvent] }

  def fileLog: Dataset[FileLedgerEvent] =
    try spark.read.parquet(fileDir).as[FileLedgerEvent]
    catch { case _: Throwable => spark.emptyDataset[FileLedgerEvent] }

  /** Latest event per (s3Prefix, batchId) — the current batch state. */
  def currentBatches: DataFrame = {
    val w = Window.partitionBy($"s3Prefix", $"batchId").orderBy($"lastUpdate".desc)
    batchLog.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }

  /** Point lookup (describeBatch CLI —
    * `/root/reference/batchOperations.js:60-89`). */
  def describeBatch(s3Prefix: String, batchId: String): DataFrame =
    currentBatches.filter($"s3Prefix" === s3Prefix && $"batchId" === batchId)

  /** The reference's one real query (GSI on status+lastUpdate,
    * `batchOperations.js:101-184`): batches by status, optional time
    * range, projected like queryBatches.js.
    */
  def queryBatches(status: String, afterMs: Option[Long] = None,
                   beforeMs: Option[Long] = None): DataFrame = {
    var df = currentBatches.filter($"status" === status)
    afterMs.foreach(a => df = df.filter($"lastUpdate" >= a))
    beforeMs.foreach(b => df = df.filter($"lastUpdate" <= b))
    df.select($"s3Prefix", $"batchId", $"status",
      from_unixtime($"lastUpdate" / 1000).as("lastUpdateDate"), $"lastUpdate")
  }

  /** Current dedup/audit state per file (processedFiles --query). */
  def processedFiles: DataFrame = {
    val w = Window.partitionBy($"loadFile").orderBy($"receiveDateTime".desc, $"timesReceived".desc)
    fileLog.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }
}
