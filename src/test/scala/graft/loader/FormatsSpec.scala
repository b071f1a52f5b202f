package graft.loader

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Format directives coverage (S6-S10): JSON auto + jsonpaths, Avro,
  * gzip-compressed CSV, header skip, EMPTYASNULL/BLANKSASNULL shims.
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(name: String, content: Array[Byte]): String = {
    val d = Files.createTempDirectory("graft-fmt")
    val p = d.resolve(name)
    Files.write(p, content)
    p.toString
  }

  test("JSON 'auto' reads by name; jsonpaths projects positionally (S8)") {
    val p = tmp("a.json",
      """{"a":{"b":1},"c":"x"}
        |{"a":{"b":2},"c":"y"}
        |""".stripMargin.getBytes)
    val auto = Formats.read(spark, LoadConfig("p", DataFormat.Json), Seq(p), None)
    assert(auto.count() == 2 && auto.columns.toSet == Set("a", "c"))

    val pathed = Formats.read(spark,
      LoadConfig("p", DataFormat.Json, jsonPaths = Some(Seq("$.a.b", "$.c"))), Seq(p), None)
    assert(pathed.columns.toSeq == Seq("_c0", "_c1"))
    assert(pathed.orderBy("_c0").as[(Long, String)].collect().toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("Avro round-trip (S8)") {
    // the spark-avro datasource module is not shipped in this
    // environment's /opt/spark/jars (zero egress, unmanaged classpath);
    // the Formats code path is exercised wherever spark-avro is deployed
    assume(
      try {
        org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
          "avro", spark.sessionState.conf); true
      } catch { case _: Throwable => false },
      "spark-avro datasource not on classpath")
    val dir = Files.createTempDirectory("graft-avro").toString + "/data"
    Seq((1, "a"), (2, "b")).toDF("id", "name").write.format("avro").save(dir)
    val files = Files.list(Paths.get(dir)).iterator()
    val avroFile = Iterator.continually(files).takeWhile(_ => files.hasNext)
      .map(_.next().toString).find(_.endsWith(".avro")).get
    val got = Formats.read(spark, LoadConfig("p", DataFormat.Avro), Seq(avroFile), None)
    assert(got.count() == 2)
    assert(got.orderBy("id").as[(Int, String)].collect().toSeq == Seq((1, "a"), (2, "b")))
  }

  test("gzip CSV auto-detects by extension; header skip honored (S7/S10)") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("col_a|col_b\n1|2\n3|4\n".getBytes); gz.close()
    val p = tmp("data.csv.gz", bos.toByteArray)
    val schema = StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType)))
    val noHeader = Formats.read(spark,
      LoadConfig("p", DataFormat.Csv, csvDelimiter = "|", ignoreCsvHeader = true),
      Seq(p), Some(schema))
    assert(noHeader.count() == 2)
    assert(noHeader.orderBy("x").as[(Int, Int)].collect().toSeq == Seq((1, 2), (3, 4)))
  }

  test("EMPTYASNULL / BLANKSASNULL shims (S10)") {
    val p = tmp("n.csv", "a,,  \nb,x,y\n".getBytes)
    val schema = StructType(Seq("c1", "c2", "c3").map(StructField(_, StringType)))
    val df = Formats.read(spark,
      LoadConfig("p", DataFormat.Csv, emptyAsNull = true, blanksAsNull = true),
      Seq(p), Some(schema))
    val rows = df.orderBy("c1").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2)) // "" and "  " → null
    assert(rows(1).getString(1) == "x")
  }

  test("column list maps read columns onto target names positionally (S6)") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val mapped = Formats.applyColumnList(df, Some(Seq("z", "y")))
    assert(mapped.columns.toSeq == Seq("z", "y"))
    assert(mapped.as[(Int, Int)].collect().head == ((1, 2)))
    intercept[IllegalArgumentException] {
      Formats.applyColumnList(df, Some(Seq("w", "x", "y", "z")))
    }
  }
}
