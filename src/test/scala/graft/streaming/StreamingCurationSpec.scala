package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import StreamingDedup.{Doc, Admitted}

/** The streaming curation pipeline: the stateless curation columns
  * (PII scrub, quality verdict, split) are ordinary projections, so
  * they compose directly into a streaming query AHEAD of the stateful
  * dedup stage — scrub-then-dedup, the order a real ingest pipeline
  * uses (and the order that makes fingerprints PII-independent).
  */
class StreamingCurationSpec extends AnyFunSuite {
  import graft.functions.Curation

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def awaitCount(table: String, n: Long, timeoutMs: Long = 60000): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var c = spark.table(table).count()
    while (c < n && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); c = spark.table(table).count()
    }
    c
  }

  test("scrub → quality-filter → dedup in one streaming query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    // stateless curation stage: redact PII, drop short docs — then the
    // stateful exact-dedup admission runs over the SCRUBBED text
    val curated = input.toDS()
      .select(col("doc_id"), Curation.redactPii(col("text")).as("text"))
      .filter(size(split(trim(col("text")), "\\s+")) >= 4)
      .as[Doc]
    val q = StreamingDedup.exact(spark, curated)
      .writeStream.format("memory").queryName("scur").outputMode("append").start()
    try {
      input.addData(Seq(
        Doc(1, "contact alice@example.com for the details"),
        // different PII, identical after scrubbing → must be suppressed,
        // proving the scrub runs BEFORE the fingerprint state
        Doc(2, "contact bob@corp.org for the details"),
        Doc(3, "too short"),                       // quality-dropped
        Doc(4, "totally different body of text here")))
      assert(awaitCount("scur", 2) == 2)
      val admitted = spark.table("scur").as[Admitted].collect().map(_.doc_id).toSet
      assert(admitted == Set(1L, 4L), s"got $admitted")
      // later micro-batch: a third PII variant of the same text — state
      // suppresses it; a fresh doc passes
      input.addData(Seq(
        Doc(5, "contact carol@mail.net for the details"),
        Doc(6, "yet another unique document body")))
      assert(awaitCount("scur", 3) == 3)
      assert(spark.table("scur").as[Admitted].collect().map(_.doc_id).toSet
        == Set(1L, 4L, 6L))
    } finally q.stop()
  }
}
