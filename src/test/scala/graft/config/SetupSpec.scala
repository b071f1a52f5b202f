package graft.config

import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.config.Setup.SetupException

/** File-driven setup parity (`setup-file.js`, `setup.js:213-258`):
  * validation rules, field translation, URL assembly + override escape,
  * and the full path config-file → ConfigStore → working Pipeline watch.
  */
class SetupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def setupJson(extra: String = "",
                        df: String = "CSV",
                        delim: String = "\"csvDelimiter\": \"|\",") =
    s"""{
       |  "s3Prefix": "s3://bucket/input/",
       |  "clusterEndpoint": "db.example.internal",
       |  "clusterPort": 5439,
       |  "clusterDB": "dev",
       |  "useSSL": "N",
       |  "userName": "loader",
       |  "userPwd": "hunter2",
       |  "table": "setup_target",
       |  "truncateTable": "N",
       |  "df": "$df",
       |  $delim
       |  "ignoreCsvHeader": "Y",
       |  "manifestBucket": "mbucket",
       |  "manifestPrefix": "manifests",
       |  "failedManifestPrefix": "failed",
       |  "batchSize": 2,
       |  "batchTimeoutSecs": 10,
       |  "filenameFilter": ".*\\\\.csv$$"$extra
       |}""".stripMargin

  test("translates the setup-file shape: url assembly, prefix norm, booleans, ints") {
    val cfg = Setup.fromJson(setupJson(), pw => s"enc($pw)")
    assert(cfg.s3Prefix == "bucket/input") // s3:// stripped, right-trimmed
    assert(cfg.dataFormat == DataFormat.Csv && cfg.csvDelimiter == "|")
    assert(cfg.ignoreCsvHeader && cfg.batchSize == 2 && cfg.batchTimeoutSecs.contains(10))
    assert(cfg.filenameFilterRegex.contains(".*\\.csv$"))
    assert(cfg.manifestDir.contains("mbucket/manifests"))
    assert(cfg.failedManifestDir.contains("mbucket/failed"))
    val t = cfg.targets.head
    assert(t.jdbcUrl == "jdbc:postgresql://db.example.internal:5439/dev")
    assert(t.user == "loader" && t.encryptedPassword == "enc(hunter2)")
    assert(t.targetTable == "setup_target" && !t.truncateTarget)
  }

  test("validation parity: required fields, format allow-list, csv delimiter, int parse") {
    def without(field: String): String =
      setupJson().linesIterator.filterNot(_.contains("\"" + field + "\"")).mkString("\n")
    intercept[SetupException](Setup.fromJson(without("s3Prefix")))
    intercept[SetupException](Setup.fromJson(without("clusterEndpoint")))
    intercept[SetupException](Setup.fromJson(without("userName")))
    intercept[SetupException](Setup.fromJson(without("userPwd")))
    intercept[SetupException](Setup.fromJson(without("table")))
    intercept[SetupException](Setup.fromJson(without("manifestBucket")))
    intercept[SetupException](Setup.fromJson(setupJson(df = "XML")))
    // CSV without a delimiter refused; PARQUET without one fine
    intercept[SetupException](Setup.fromJson(setupJson(delim = "")))
    Setup.fromJson(setupJson(df = "PARQUET", delim = ""))
    intercept[SetupException](
      Setup.fromJson(setupJson().replace("\"clusterPort\": 5439", "\"clusterPort\": \"abc\"")))
  }

  test("useSSL appends the non-validating factory; override env wins (C11)") {
    assert(Setup.buildJdbcUrl("h", 5439, None, useSSL = true)
      == "jdbc:postgresql://h:5439?ssl=true&sslfactory=org.postgresql.ssl.NonValidatingFactory")
    assert(Setup.resolveJdbcUrl("jdbc:a", _ => Some("jdbc:override")) == "jdbc:override")
    assert(Setup.resolveJdbcUrl("jdbc:a", _ => None) == "jdbc:a")
  }

  test("jsonpaths file location is read Redshift-style at setup time") {
    val jp = Files.createTempFile("graft-jp", ".json")
    Files.writeString(jp, """{"jsonpaths": ["$.a.b", "$.c"]}""")
    val cfg = Setup.fromJson(setupJson(
      extra = s""",\n  "jsonPaths": "${jp.toString}"""", df = "JSON", delim = ""))
    assert(cfg.jsonPaths.contains(Seq("$.a.b", "$.c")))
  }

  test("e2e: setup CLI -> ConfigStore -> Pipeline watch loads files") {
    val root = Files.createTempDirectory("graft-setup-pipe").toString
    val ledgerDir = Files.createTempDirectory("graft-setup-ledger").toString
    val ckpt = Files.createTempDirectory("graft-setup-ckpt").toString
    val storeDir = Files.createTempDirectory("graft-setup-store").toString
    val keyDir = Files.createTempDirectory("graft-setup-keys").toString
    Files.createDirectories(Paths.get(s"$root/bucket/input"))

    val url = "jdbc:derby:memory:setupspec;create=true"
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute("CREATE TABLE setup_e2e(column_a INT, column_b INT)")

    // the CLI input, pointing at Derby via the override escape hatch
    // (the assembled postgres URL has no server behind it in this test)
    val file = Files.createTempFile("graft-setup", ".json")
    Files.writeString(file, setupJson().replace("setup_target", "setup_e2e"))
    val stored = Setup.run(file.toString, storeDir, keyDir)

    val store = new ConfigStore(storeDir)
    val ks = graft.crypto.Keystore(keyDir)
    val got = store.get("bucket/input").get
    assert(ks.decrypt(got.targets.head.encryptedPassword) == "hunter2")
    assert(stored.copy(version = ConfigCodec.CurrentVersion) == got)

    // swap the assembled URL for the local Derby target (the override
    // seam applied at config level) and start the watch from the STORE
    val runCfg = got.copy(targets =
      got.targets.map(_.copy(jdbcUrl = url, user = "", encryptedPassword = "")))
    val schema = StructType(Seq(
      StructField("column_a", IntegerType), StructField("column_b", IntegerType)))
    // setup file says ignoreCsvHeader=Y — the header line must be skipped
    Files.write(Paths.get(s"$root/bucket/input/a.csv"),
      "column_a|column_b\n1|2\n3|4\n".getBytes)

    val q = graft.Pipeline.start(spark,
      graft.Pipeline.Settings(root, ledgerDir, ckpt, triggerInterval = "1 second",
        schemas = Map("setup_e2e" -> schema)),
      Map(runCfg.s3Prefix -> runCfg))
    try {
      def rows(): Long = {
        val rs = c0.createStatement().executeQuery("SELECT count(*) FROM setup_e2e")
        rs.next(); val n = rs.getLong(1); rs.close(); n
      }
      val deadline = System.currentTimeMillis() + 90000
      while (rows() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(500)
      assert(rows() == 2, "file under the setup-registered prefix loaded")
    } finally q.stop()
  }
}
