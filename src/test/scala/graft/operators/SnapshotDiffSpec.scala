package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SnapshotDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    val prev = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, None: Option[String], 30),
      (4L, Some("d"), 40), (5L, None: Option[String], 50)
    ).toDF("k", "v", "x")
    val next = Seq(
      (1L, Some("a"), 10),              // unchanged
      (2L, Some("B"), 20),              // changed (v)
      (3L, None: Option[String], 31),   // changed (x; null v compares equal)
      (5L, None: Option[String], 50),   // unchanged (null <=> null)
      (6L, Some("f"), 60)               // added
    ).toDF("k", "v", "x")
    val got = SnapshotDiff.diff(prev, next, Seq("k"), Seq("v", "x"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "unchanged", 6L -> "added"))
  }

  test("summary counts per change type") {
    val prev = Seq((1L, 1), (2L, 2)).toDF("k", "v")
    val next = Seq((2L, 9), (3L, 3)).toDF("k", "v")
    val got = SnapshotDiff.summary(prev, next, Seq("k"), Seq("v"))
      .collect().map(r => r.getAs[String]("change_type") -> r.getAs[Long]("n_keys")).toMap
    assert(got == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L))
  }

  test("multi-column keys") {
    val prev = Seq((1L, "x", 10), (1L, "y", 20)).toDF("k1", "k2", "v")
    val next = Seq((1L, "x", 10), (1L, "z", 30)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(prev, next, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getAs[Long]("k1"), r.getAs[String]("k2")) ->
        r.getAs[String]("change_type")).toMap
    assert(got == Map((1L, "x") -> "unchanged", (1L, "y") -> "removed",
      (1L, "z") -> "added"))
  }
}
