package graft.ledger

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Crash-safety of the compaction swap and read-side schema migration of
  * pre-upgrade ledgers — both must leave a readable ledger after
  * reconstruction, never an empty or unreadable one.
  */
class LedgerCrashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(id: String, status: BatchStatus, at: Long) =
    BatchRecord("b/k", id, status.name, Seq(BatchEntry(s"b/k/$id.csv", 10, at)), 10L, at)

  private def seeded(dir: String): Ledger = {
    val l = new Ledger(spark, dir)
    l.appendBatch(rec("b1", BatchStatus.Open, 1000))
    l.appendBatch(rec("b1", BatchStatus.Complete, 2000))
    l.appendBatch(rec("b2", BatchStatus.Error, 3000))
    l.appendFiles(Seq(
      ProcessedFile("b/k/b1.csv", 1000, 1, Some("b1")),
      ProcessedFile("b/k/b2.csv", 3000, 1, Some("b2"))), 3000)
    l
  }

  for (step <- 1 to 3)
    test(s"compaction crash after step $step: next construction recovers full state") {
      val dir = Files.createTempDirectory(s"graft-crash$step").toString
      val l = seeded(dir)
      intercept[IllegalStateException] {
        l.compactOne(s"$dir/batches", () => l.currentBatches, crashAfterStep = step)
      }
      // a NEW Ledger (fresh process analogue) must see the full state
      val l2 = new Ledger(spark, dir)
      assert(l2.currentBatches.count() == 2)
      assert(l2.describeBatch("b/k", "b1").collect().head.getAs[String]("status") == "complete")
      assert(l2.processedFiles.count() == 2)
      // no swap debris left behind
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/batches.old")))
      // a subsequent full compact still works
      l2.compact()
      assert(new Ledger(spark, dir).currentBatches.count() == 2)
    }

  test("pre-upgrade ledger (no seq/deleted columns) reads with defaults") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mig").toString
    // write logs in the round-1 on-disk shape: batch events without seq,
    // file events without seq/deleted
    Seq(("b/k", "b1", "open", Seq("f1"), Seq(10L), 10L, "", Map.empty[String, String], "", "", 1000L,
         new java.sql.Date(0L)),
        ("b/k", "b1", "complete", Seq("f1"), Seq(10L), 10L, "", Map.empty[String, String], "", "", 2000L,
         new java.sql.Date(0L)))
      .toDF("s3Prefix", "batchId", "status", "entryFiles", "entrySizes", "sizeBytes",
        "manifestFile", "targetStatus", "errorMessage", "updateReason", "lastUpdate", "eventDate")
      .write.partitionBy("eventDate").parquet(s"$dir/batches")
    Seq(("b/k/f1", 1000L, 1, "b1", Seq.empty[String], new java.sql.Date(0L)))
      .toDF("loadFile", "receiveDateTime", "timesReceived", "batchId", "previousBatches", "eventDate")
      .write.partitionBy("eventDate").parquet(s"$dir/files")

    val l = new Ledger(spark, dir) // must not throw on construction
    assert(l.currentBatches.count() == 1)
    assert(l.describeBatch("b/k", "b1").collect().head.getAs[String]("status") == "complete")
    assert(l.processedFiles.count() == 1)
    // post-upgrade appends interleave cleanly with migrated rows
    l.appendBatch(rec("b1", BatchStatus.Error, 2000)) // same ms as old latest
    assert(l.describeBatch("b/k", "b1").collect().head.getAs[String]("status") == "error",
      "new event wins the same-millisecond tie via seq > 0")
  }
}
