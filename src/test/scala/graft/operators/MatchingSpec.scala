package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MatchingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def matchOf(treated: Seq[(Long, Long)], control: Seq[(Long, Long)],
                      caliper: Long) =
    Matching.nearestWithin(
        treated.toDF("id", "x"), control.toDF("id", "x"), "id", "x", caliper)
      .collect()
      .map(r => r.getAs[Long]("t_id") ->
        ((r.getAs[Long]("c_id"), r.getAs[Long]("c_x"), r.getAs[Long]("diff"))))
      .toMap

  test("nearest control wins; equal distance ties to the smaller control id") {
    val got = matchOf(
      treated = Seq((10L, 100L)),
      control = Seq((1L, 90L), (2L, 110L), (3L, 105L)),
      caliper = 15L)
    assert(got == Map(10L -> ((3L, 105L, 5L))))
    // remove the closest: 90 and 110 are both at distance 10 → id 1
    val tie = matchOf(Seq((10L, 100L)), Seq((1L, 90L), (2L, 110L)), 15L)
    assert(tie == Map(10L -> ((1L, 90L, 10L))))
  }

  test("caliper is inclusive; out-of-caliper treated units drop out") {
    val got = matchOf(
      treated = Seq((10L, 100L), (11L, 500L)),
      control = Seq((1L, 85L)),
      caliper = 15L)
    // diff == caliper (15) matches; 11 has nothing within reach
    assert(got == Map(10L -> ((1L, 85L, 15L))))
  }

  test("negative covariates: bucket adjacency holds across zero") {
    val got = matchOf(
      treated = Seq((10L, -5L)),
      control = Seq((1L, -10L), (2L, 3L)),
      caliper = 5L)
    // both at the caliper boundary around a bucket edge: -10 (diff 5)
    // vs 3 (diff 8 — outside); floor bucketing must not lose either
    assert(got == Map(10L -> ((1L, -10L, 5L))))
  }

  test("matching is with replacement; plan has no window and no cartesian") {
    val out = Matching.nearestWithin(
      Seq((10L, 100L), (11L, 101L)).toDF("id", "x"),
      Seq((1L, 99L)).toDF("id", "x"), "id", "x", 5L)
    val got = out.collect().map(r =>
      r.getAs[Long]("t_id") -> r.getAs[Long]("c_id")).toMap
    assert(got == Map(10L -> 1L, 11L -> 1L), "one control can serve many")
    val p = out.queryExecution.sparkPlan
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "argmin must be the mergeable min_by aggregate, not a window")
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "candidate join must be the bucketed equi-join")
  }
}
