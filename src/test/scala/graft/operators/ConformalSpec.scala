package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConformalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Straight-line replay: OLS on the train rows in the identical
    * IEEE shape, quantized |resid| order statistic on the cal rows.
    */
  private def ref(rows: Seq[(Int, Long, Long)], aN: Long, aD: Long):
      (Long, Long, Double, Double, Long, Long) = {
    val tr = rows.filter(_._1 == 0)
    val nD = tr.size.toDouble
    val sxD = tr.map(_._2).sum.toDouble
    val syD = tr.map(_._3).sum.toDouble
    val sxxD = tr.map(r => r._2 * r._2).sum.toDouble
    val sxyD = tr.map(r => r._2 * r._3).sum.toDouble
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    val intercept = (syD - slope * sxD) / nD
    val cal = rows.filter(_._1 == 1)
    val resid = cal.map { case (_, x, y) =>
      math.floor(math.abs(y.toDouble - (intercept + slope * x.toDouble))
        * 10000.0).toLong
    }.sorted
    val k = math.min(cal.size.toLong,
      ((cal.size + 1) * (aD - aN) + aD - 1) / aD)
    (tr.size.toLong, cal.size.toLong, slope, intercept, k,
      resid((k - 1).toInt))
  }

  private def run(rows: Seq[(Int, Long, Long)], aN: Long, aD: Long) = {
    val r = Conformal.splitConformalOls(
      rows.map { case (s, x, y) => ("m", s, x, y) }.toDF("g", "split", "x", "y"),
      "g", "split", "x", "y", aN, aD).head()
    (r.getAs[Long]("n_train"), r.getAs[Long]("n_cal"),
      r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
      r.getAs[Long]("k_rank"), r.getAs[Long]("half_width_q"))
  }

  test("splitConformalOls matches the straight-line replay at several alphas") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val x = rng.nextInt(1000).toLong
      // y = 3x + 40 + heavy-ish noise
      val y = 3 * x + 40 + (rng.nextGaussian() * 25).toLong
      (i % 2, x, y)
    }
    for ((aN, aD) <- Seq((1L, 10L), (1L, 20L), (1L, 4L)))
      assert(run(rows, aN, aD) == ref(rows, aN, aD), s"alpha=$aN/$aD")
  }

  test("splitConformalOls: empirical calibration coverage is at least 1 - alpha") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val x = rng.nextInt(500).toLong
      (i % 2, x, 2 * x + (rng.nextGaussian() * 40).toLong)
    }
    val (_, nCal, slope, intercept, _, hw) = run(rows, 1L, 10L)
    val covered = rows.filter(_._1 == 1).count { case (_, x, y) =>
      math.floor(math.abs(y.toDouble - (intercept + slope * x.toDouble))
        * 10000.0) <= hw.toDouble
    }
    assert(covered.toDouble / nCal >= 0.9,
      s"coverage ${covered.toDouble / nCal} below 1-alpha")
  }

  test("splitConformalOls: degenerate train split (constant x) drops the group") {
    val rows = (1 to 40).map(i => (i % 2, 5L, i.toLong))
    val out = Conformal.splitConformalOls(
      rows.map { case (s, x, y) => ("m", s, x, y) }.toDF("g", "split", "x", "y"),
      "g", "split", "x", "y", 1L, 10L)
    assert(out.isEmpty)
  }
}
