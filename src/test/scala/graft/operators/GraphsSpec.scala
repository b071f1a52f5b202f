package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence — the spec's
    * independent reference for the distributed implementation.
    */
  private def refRanks(edges: Seq[(String, String)], iters: Int,
                       dampNum: Long = 85L, dampDen: Long = 100L,
                       scale: Long = 1000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val mass = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => r(x._1) / deg(x._1)).sum
      }
      r = nodes.map(n => n -> (base + dampNum * mass.getOrElse(n, 0L) / dampDen)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_micro"))
      .toMap

  test("pageRank matches the integer reference replay, iters 1..4") {
    val edges = Seq(
      "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a",
      "d" -> "c", "a" -> "b" /* duplicate edge: distinct semantics */)
    for (it <- 1 to 4)
      assert(run(edges, it) == refRanks(edges, it), s"iters=$it")
  }

  test("pageRank: dangling node keeps the base rank and sinks gain mass") {
    // d has no out-edges (dangling); everything points at d
    val edges = Seq("a" -> "d", "b" -> "d", "c" -> "d", "a" -> "b")
    val got = run(edges, 3)
    assert(got == refRanks(edges, 3))
    // c has no in-edges: pure base after round 1
    assert(got("c") == 150000L)
    // the sink collects strictly more than any source
    assert(got("d") > got("a") && got("d") > got("b") && got("d") > got("c"))
  }

  test("pageRank: self-loops are legal and deterministic") {
    val edges = Seq("a" -> "a", "a" -> "b", "b" -> "a")
    assert(run(edges, 3) == refRanks(edges, 3))
  }

  test("degrees: distinct-edge out/in counts with full outer coverage") {
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "c", "c" -> "b")
    val got = Graphs.degrees(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("out_deg"), r.getAs[Long]("in_deg")))
      .toSet
    assert(got == Set(("a", 2L, 0L), ("b", 0L, 2L), ("c", 1L, 1L)))
  }
}
