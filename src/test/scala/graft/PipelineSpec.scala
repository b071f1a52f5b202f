package graft

import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ledger.Ledger
import graft.notify.CollectingNotifier

/** Grand end-to-end: files on disk → streaming discovery → stateful
  * batching → transactional Derby load → ledger + notifications. The
  * reference's sample walkthrough (sample/README.md) as one test.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("files → batches → Derby rows → ledger complete → success notifications") {
    val root = Files.createTempDirectory("graft-pipe").toString
    val ledgerDir = Files.createTempDirectory("graft-pipe-ledger").toString
    val ckpt = Files.createTempDirectory("graft-pipe-ckpt").toString
    Files.createDirectories(Paths.get(s"$root/bucket/input"))

    val url = "jdbc:derby:memory:pipespec;create=true"
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute(
      "CREATE TABLE pipe_target(column_a INT, column_b INT, column_c INT)")

    val schema = StructType(Seq(
      StructField("column_a", IntegerType),
      StructField("column_b", IntegerType),
      StructField("column_c", IntegerType)))
    val cfg = LoadConfig(
      s3Prefix = "bucket/input", dataFormat = DataFormat.Csv, csvDelimiter = "|",
      batchSize = 2, batchTimeoutSecs = Some(10),
      targets = Seq(LoadTarget(url, "", "", "pipe_target")))
    val notifier = new CollectingNotifier

    // five sample files, values 7..36 (FIXTURES.md §1)
    (0 until 5).foreach { i =>
      val b = 7 + i * 6
      Files.write(Paths.get(s"$root/bucket/input/s$i.csv"),
        s"$b|${b + 1}|${b + 2}\n${b + 3}|${b + 4}|${b + 5}\n".getBytes)
    }

    val q = Pipeline.start(spark,
      Pipeline.Settings(root, ledgerDir, ckpt, triggerInterval = "1 second",
        schemas = Map("pipe_target" -> schema)),
      Map("bucket/input" -> cfg), notifier)

    try {
      def rows(): Long = {
        val rs = c0.createStatement().executeQuery("SELECT count(*) FROM pipe_target")
        rs.next(); val n = rs.getLong(1); rs.close(); n
      }
      val deadline = System.currentTimeMillis() + 120000
      while (rows() < 10 && System.currentTimeMillis() < deadline) Thread.sleep(500)
      assert(rows() == 10, "all five files (2 count-batches + 1 age batch) loaded")
      val rs = c0.createStatement().executeQuery(
        "SELECT sum(column_a)+sum(column_b)+sum(column_c) FROM pipe_target")
      rs.next(); assert(rs.getLong(1) == (7 to 36).sum)

      // the JDBC commit lands before the ledger append — poll the ledger
      // for the trailing batch instead of asserting immediately
      val ledger = new Ledger(spark, ledgerDir)
      def completeCount(): Long =
        try ledger.queryBatches("complete").count() catch { case _: Throwable => 0L }
      val ledgerDeadline = System.currentTimeMillis() + 60000
      while (completeCount() < 3 && System.currentTimeMillis() < ledgerDeadline)
        Thread.sleep(500)
      assert(completeCount() == 3)
      assert(ledger.processedFiles.count() == 5)
      assert(notifier.received.count(_.status == "complete") == 3)
      assert(notifier.received.forall(_.error.isEmpty))
      // S5: every completed batch has a manifest audit artifact on disk
      val manifests = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$ledgerDir/manifests")).count()
      assert(manifests == 3)
    } finally q.stop()
  }

  test("failure path: bad target → error status, failed manifest, failure notification (S12/T8)") {
    val root = Files.createTempDirectory("graft-pipef").toString
    val ledgerDir = Files.createTempDirectory("graft-pipef-ledger").toString
    val ckpt = Files.createTempDirectory("graft-pipef-ckpt").toString
    Files.createDirectories(Paths.get(s"$root/bucket/input"))
    val schema = StructType(Seq(StructField("column_a", IntegerType)))
    val cfg = LoadConfig(
      s3Prefix = "bucket/input", dataFormat = DataFormat.Csv,
      batchSize = 1,
      targets = Seq(LoadTarget("jdbc:derby:memory:doesnotexist", "", "", "no_table")))
    val notifier = new CollectingNotifier
    Files.write(Paths.get(s"$root/bucket/input/f.csv"), "1\n".getBytes)

    val q = Pipeline.start(spark,
      Pipeline.Settings(root, ledgerDir, ckpt, triggerInterval = "1 second",
        schemas = Map("no_table" -> schema), maxAutoReprocess = 1),
      Map("bucket/input" -> cfg), notifier)
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (notifier.received.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      Thread.sleep(2000) // allow the auto-reprocess attempt to finish
      assert(notifier.received.nonEmpty)
      assert(notifier.received.forall(_.status == "error"))
      assert(notifier.received.forall(_.error.isDefined))
      assert(notifier.received.forall(_.failedManifest.isDefined))
      // auto-reprocess hook retried once → two error notifications
      assert(notifier.received.size == 2)
      val failed = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$ledgerDir/failed-manifests")).count()
      assert(failed >= 1)
      val ledger = new Ledger(spark, ledgerDir)
      assert(ledger.queryBatches("error").count() == 1)
    } finally q.stop()
  }
}
