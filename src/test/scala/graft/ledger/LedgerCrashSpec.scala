package graft.ledger

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Hadoop signals most rename failures by RETURNING FALSE, not throwing.
  * This local filesystem makes the two compaction-swap renames do exactly
  * that (selected by name shape, so parquet write-commit renames inside
  * the `.compact` dir are untouched), driving the real swap code through
  * the failure mode the crash seams can't reach.
  */
class FlakyRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    val aside = dst.getName.endsWith(".old")
    val in = src.getName.endsWith(".compact") && !dst.getName.endsWith(".compact")
    FlakyRenameFileSystem.mode match {
      case "fail-aside" if aside => false
      case "fail-in" if in => false
      case _ => super.rename(src, dst)
    }
  }
}
object FlakyRenameFileSystem { @volatile var mode: String = "off" }

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

  test("rename returning FALSE aborts the swap before any delete touches the log") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.flaky.impl", classOf[FlakyRenameFileSystem].getName)
    val dir = "flaky:" + Files.createTempDirectory("graft-flaky").toString
    FlakyRenameFileSystem.mode = "off"
    val l = seeded(dir)
    try {
      // rename-aside fails silently → compactOne must throw, and the live
      // log must survive untouched (pre-fix, execution fell through)
      FlakyRenameFileSystem.mode = "fail-aside"
      val ex = intercept[java.io.IOException] {
        l.compactOne(s"$dir/batches", () => l.currentBatches)
      }
      assert(ex.getMessage.contains("rename"))
      FlakyRenameFileSystem.mode = "off"
      val l2 = new Ledger(spark, dir)
      assert(l2.currentBatches.count() == 2)

      // rename-IN fails after live was moved aside: abort, then the next
      // construction's recoverSwap must ALSO abort on a false rename
      // rather than fall through — and complete once renames work again
      FlakyRenameFileSystem.mode = "fail-in"
      intercept[java.io.IOException] {
        l2.compactOne(s"$dir/batches", () => l2.currentBatches)
      }
      intercept[java.io.IOException] { new Ledger(spark, dir) }
      FlakyRenameFileSystem.mode = "off"
      val l3 = new Ledger(spark, dir)
      assert(l3.currentBatches.count() == 2)
      assert(l3.processedFiles.count() == 2)
    } finally FlakyRenameFileSystem.mode = "off"
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
