package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RegressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("sufficient statistics and slope match a driver-side reference") {
    val pts = Seq(
      ("a", 0L, 10L), ("a", 1L, 13L), ("a", 2L, 16L), ("a", 3L, 19L), // exact slope 3
      ("b", 0L, 5L), ("b", 2L, 1L), ("b", 4L, 9L), ("b", 6L, 1L),
      ("c", 7L, 42L), ("c", 7L, 44L))                                 // constant x
    val out = Regression.groupedOls(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap

    pts.groupBy(_._1).foreach { case (g, rows) =>
      val n = rows.size.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(p => p._2 * p._2).sum
      val sxy = rows.map(p => p._2 * p._3).sum
      val r = out(g)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sx") == sx &&
        r.getAs[Long]("sy") == sy && r.getAs[Long]("sxx") == sxx &&
        r.getAs[Long]("sxy") == sxy, s"stats for $g")
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      if (den == 0.0) {
        assert(r.isNullAt(r.fieldIndex("slope")), s"constant-x $g: null slope")
        assert(r.isNullAt(r.fieldIndex("intercept")))
      } else {
        val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
        assert(r.getAs[Double]("slope") == num / den, s"slope for $g")
        assert(r.getAs[Double]("intercept") ==
          (sy.toDouble - (num / den) * sx.toDouble) / n.toDouble)
      }
    }
    assert(out("a").getAs[Double]("slope") == 3.0)
  }

  test("microUnits is exact fixed-point (no round-vs-truncate trap)") {
    val vals = Seq(0.0, 1.5, -2.25, 123.456789, -0.0000005, 99999.999999)
    val got = vals.toDF("v").select(Regression.microUnits($"v").as("y"))
      .collect().map(_.getLong(0))
    // reference: the decimal(18,6) HALF_UP rounding of the double, ×1e6
    val ref = vals.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000L)
      .map(_.toLongExact)
    assert(got.toSeq == ref)
  }

  test("plan: single hash aggregate, no window, no sort before the agg") {
    val df = (1 to 1000).map(i => (s"g${i % 7}", (i % 13).toLong, i.toLong))
      .toDF("g", "x", "y")
    val plan = Regression.groupedOls(df, "g", "x", "y").queryExecution.sparkPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }
    assert(aggs.nonEmpty, "expected hash aggregation")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      "sufficient-stats OLS must not sort")
  }

  test("sufficient statistics are streaming-mergeable: complete-mode OLS ≡ batch over the union of micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq(("a", 0L, 10L), ("a", 1L, 13L), ("b", 0L, 5L))
    val b2 = Seq(("a", 2L, 16L), ("a", 3L, 19L), ("b", 2L, 1L), ("b", 4L, 9L))
    val input = MemoryStream[(String, Long, Long)]
    val ols = Regression.groupedOls(input.toDF().toDF("g", "x", "y"), "g", "x", "y")
    val q = ols.writeStream.format("memory").queryName("olsstream")
      .outputMode("complete").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val stream = spark.table("olsstream").collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("sxy"), r.getAs[Double]("slope"))).toMap
      val batch = Regression.groupedOls((b1 ++ b2).toDF("g", "x", "y"), "g", "x", "y")
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("sxy"), r.getAs[Double]("slope"))).toMap
      assert(stream == batch)
    } finally q.stop()
  }
}
