package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class StoredMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-merge-wh").toString)
    .getOrCreate()
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
      r.getAs[Long]("ver"))).toSet

  test("upsert: replace on key match, insert new keys, pass through the rest") {
    val stored = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "ver")
    val updates = Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("k", "v", "ver")
    val got = rows(StoredMerge.upsert(stored, updates, Seq("k")))
    assert(got == Set((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
  }

  test("upsertLatest: a stale update must not clobber a newer stored row") {
    val stored = Seq((1L, "new", 5L), (2L, "old", 1L)).toDF("k", "v", "ver")
    val updates = Seq((1L, "stale", 3L), (2L, "fresh", 4L), (3L, "ins", 1L))
      .toDF("k", "v", "ver")
    val got = rows(StoredMerge.upsertLatest(stored, updates, Seq("k"), "ver", "v"))
    assert(got == Set((1L, "new", 5L), (2L, "fresh", 4L), (3L, "ins", 1L)))
  }

  test("upsertLatest: version ties resolve by the tie-break column, deterministically") {
    val stored = Seq((1L, "aa", 7L)).toDF("k", "v", "ver")
    val updates = Seq((1L, "zz", 7L)).toDF("k", "v", "ver")
    val got = rows(StoredMerge.upsertLatest(stored, updates, Seq("k"), "ver", "v"))
    assert(got == Set((1L, "zz", 7L))) // 'zz' > 'aa'
  }

  test("requireUniqueKeys rejects a batch with duplicate keys") {
    val dup = Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("k", "v", "ver")
    intercept[IllegalArgumentException] {
      StoredMerge.requireUniqueKeys(dup, Seq("k"))
    }
    StoredMerge.requireUniqueKeys(dup.limit(1), Seq("k")) // unique: fine
  }

  test("upsertStored: two successive merges accrete correctly and keep the bucket layout") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val tbl = s"merge${System.nanoTime()}"
    try {
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
        .write.bucketBy(4, "k").sortBy("k").saveAsTable(tbl)
      StoredMerge.upsertStored(spark, tbl,
        Seq((2L, "B", 2L), (3L, "c", 2L)).toDF("k", "v", "ver"), Seq("k"), buckets = 4)
      StoredMerge.upsertStored(spark, tbl,
        Seq((3L, "C", 3L), (4L, "d", 3L)).toDF("k", "v", "ver"), Seq("k"), buckets = 4)
      assert(rows(spark.table(tbl)) ==
        Set((1L, "a", 1L), (2L, "B", 2L), (3L, "C", 3L), (4L, "d", 3L)))

      // the stored side of the NEXT merge's anti-join rides its
      // bucketing — no exchange over the stored scan (forced SMJ)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val next = StoredMerge.upsert(spark.table(tbl),
          Seq((4L, "D", 4L)).toDF("k", "v", "ver"), Seq("k"))
        next.collect()
        val plan = next.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        def overStored(p: SparkPlan): Boolean =
          p.collectLeaves().exists(_.toString.contains(tbl))
        val shuffles = plan.collect {
          case s: ShuffleExchangeExec if overStored(s) => s
        }
        assert(shuffles.isEmpty, s"stored side must ride its bucketing:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
