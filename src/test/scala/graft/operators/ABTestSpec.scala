package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ABTestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** The identical IEEE shape, straight-line. */
  private def refWelch(a: Seq[Long], b: Seq[Long]) = {
    val naD = a.size.toDouble; val nbD = b.size.toDouble
    val saD = a.sum.toDouble; val sbD = b.sum.toDouble
    val ssA = a.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
    val ssB = b.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
    val meanA = saD / naD; val meanB = sbD / nbD
    val varA = (ssA - saD * saD / naD) / (naD - 1.0)
    val varB = (ssB - sbD * sbD / nbD) / (nbD - 1.0)
    val seA = varA / naD; val seB = varB / nbD
    val se2 = seA + seB
    val t = (meanA - meanB) / math.sqrt(se2)
    val dfW = (se2 * se2) / (seA * seA / (naD - 1.0) + seB * seB / (nbD - 1.0))
    (meanA, meanB, varA, varB, t, dfW)
  }

  test("welch = straight-line reference bit-identically on random integer data") {
    val rng = new scala.util.Random(71)
    val rows = for {
      g <- Seq("g1", "g2"); arm <- Seq(0, 1)
      i <- 0 until (20 + rng.nextInt(30))
    } yield (g, arm, (rng.nextInt(2000) - 500).toLong + (if (arm == 1) 100 else 0))
    val got = ABTest.welch(rows.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("g1", "g2")) {
      val a = rows.collect { case (`g`, 0, v) => v }
      val b = rows.collect { case (`g`, 1, v) => v }
      val (meanA, meanB, varA, varB, t, dfW) = refWelch(a, b)
      val r = got(g)
      assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
      assert(r.getAs[Double]("mean_a") == meanA && r.getAs[Double]("mean_b") == meanB)
      assert(r.getAs[Double]("var_a") == varA && r.getAs[Double]("var_b") == varB)
      assert(r.getAs[Double]("t_stat") == t, s"$g t")
      assert(r.getAs[Double]("df_welch") == dfW, s"$g df")
    }
  }

  test("welch sanity: a planted arm shift produces a large |t|; equal arms small |t|") {
    val rng = new scala.util.Random(73)
    val shifted = (0 until 400).map(i => ("s", i % 2, rng.nextInt(100).toLong + (i % 2) * 500L)) ++
      (0 until 400).map(i => ("e", i % 2, rng.nextInt(100).toLong))
    val got = ABTest.welch(shifted.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("t_stat")).toMap
    assert(math.abs(got("s")) > 20, s"shifted t=${got("s")}")
    assert(math.abs(got("e")) < 5, s"equal t=${got("e")}")
  }

  test("guards: undersized arms and zero-variance pairs yield null t") {
    val rows = Seq(
      ("one", 0, 5L), ("one", 1, 7L), ("one", 1, 9L),         // n_a = 1
      ("zv", 0, 4L), ("zv", 0, 4L), ("zv", 1, 4L), ("zv", 1, 4L)) // both vars 0
    val got = ABTest.welch(rows.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect().map(r => r.getAs[String]("g") ->
        Option(r.getAs[java.lang.Double]("t_stat"))).toMap
    assert(got("one").isEmpty && got("zv").isEmpty)
  }
}
