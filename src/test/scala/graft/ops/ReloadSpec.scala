package graft.ops

import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ledger.Ledger
import graft.streaming.Batcher

class ReloadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reloadBatch loads an errored batch's files under a fresh id (T7/T8)") {
    val root = Files.createTempDirectory("graft-reload").toString
    Files.createDirectories(Paths.get(s"$root/bucket/input"))
    Files.write(Paths.get(s"$root/bucket/input/a.csv"), "1|2|3\n".getBytes)
    Files.write(Paths.get(s"$root/bucket/input/b.csv"), "4|5|6\n".getBytes)
    val url = "jdbc:derby:memory:reload;create=true"
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute("CREATE TABLE rl(a INT, b INT, c INT)")
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, IntegerType)))
    val cfg = LoadConfig("bucket/input", DataFormat.Csv, csvDelimiter = "|",
      targets = Seq(LoadTarget(url, "", "", "rl")))
    val ledger = new Ledger(spark, Files.createTempDirectory("graft-reload-l").toString)
    val ops = new Ops(spark, ledger)
    // an errored batch in the ledger whose files exist on disk
    ledger.appendBatch(BatchRecord("bucket/input", "bad1", BatchStatus.Error.name,
      Seq(BatchEntry("bucket/input/a.csv", 6, 0), BatchEntry("bucket/input/b.csv", 6, 0)),
      12, System.currentTimeMillis()))

    val r = ops.reloadBatch("bucket/input", "bad1", cfg, root, Some(schema))
    assert(r.ok, r.message)
    val rs = c0.createStatement().executeQuery("SELECT count(*), sum(a+b+c) FROM rl")
    rs.next()
    assert(rs.getLong(1) == 2 && rs.getLong(2) == 21)
    // original batch stamped reprocessed; reload batch recorded complete
    assert(ledger.describeBatch("bucket/input", "bad1")
      .collect().head.getAs[String]("status") == "reprocessed")
    assert(ledger.queryBatches("complete").count() == 1)
    // guard: reloading an open batch refuses
    ledger.appendBatch(BatchRecord("bucket/input", "open1", BatchStatus.Open.name,
      Seq(BatchEntry("bucket/input/a.csv", 6, 0)), 6, System.currentTimeMillis()))
    assert(!ops.reloadBatch("bucket/input", "open1", cfg, root, Some(schema)).ok)
  }

  test("batcher dedup-ledger eviction keeps state bounded") {
    import org.apache.spark.api.java.Optional
    val cfg = LoadConfig("b/in", batchSize = 1000000)
    val configs = Map("b/in" -> cfg)
    val state = org.apache.spark.sql.streaming.TestGroupState.create[graft.streaming.BatcherState](
      Optional.empty[graft.streaming.BatcherState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]], hasTimedOut = false)
    val n = Batcher.DefaultMaxLedgerEntries + 10
    val events = (1 to n).iterator.map(i => FileEvent("b", s"in/f$i.csv", 1, 1000L))
    Batcher.processPrefix(configs, () => 1000L)("b/in", events, state).foreach(_ => ())
    val st = state.get
    assert(st.processed.size == Batcher.DefaultMaxLedgerEntries)
    assert(st.processedOrder.size == Batcher.DefaultMaxLedgerEntries)
    // oldest evicted, newest retained
    assert(!st.processed.contains("b/in/f1.csv"))
    assert(st.processed.contains(s"b/in/f$n.csv"))
  }
}
