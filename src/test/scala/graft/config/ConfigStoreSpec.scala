package graft.config

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class ConfigStoreSpec extends AnyFunSuite {

  private def fresh() = new ConfigStore(Files.createTempDirectory("graft-cfg").toString)

  private val cfg = LoadConfig(
    s3Prefix = "bucket/in=put/path", // exercises URL-encoded filenames
    dataFormat = DataFormat.Csv, csvDelimiter = "|", ignoreCsvHeader = true,
    jsonPaths = Some(Seq("$.a.b", "$.c")),
    batchSize = 5, batchSizeBytes = Some(1024L), batchTimeoutSecs = Some(60),
    emptyAsNull = true, compression = Some("gzip"),
    filenameFilterRegex = Some("\\.csv$"),
    targets = Seq(LoadTarget("jdbc:derby:memory:x", "u", "enc-pw", "t",
      truncateTarget = true, presql = Some("DELETE FROM log"),
      postsql = Some("INSERT INTO log VALUES ('done')"),
      columnList = Some(Seq("a", "b")))),
    currentBatch = "b-0")

  test("round-trips the full v2 shape") {
    val store = fresh()
    store.put(cfg)
    val got = store.get(cfg.s3Prefix).get
    assert(got == cfg.copy(version = ConfigCodec.CurrentVersion))
    assert(store.all() == Map(cfg.s3Prefix -> got))
    assert(store.get("nope").isEmpty)
  }

  test("update mutates and bumps version (updateConfig parity)") {
    val store = fresh()
    store.put(cfg)
    val updated = store.update(cfg.s3Prefix, _.copy(batchSize = 99)).get
    assert(updated.batchSize == 99)
    assert(store.get(cfg.s3Prefix).get.batchSize == 99)
    assert(store.update("missing", identity).isEmpty)
  }

  test("reads legacy v1 single-target shape via migration (upgrades.js parity)") {
    val v1 = """{
      "s3Prefix": "bucket/legacy",
      "dataFormat": "CSV",
      "csvDelimiter": ",",
      "batchSize": 10,
      "jdbcUrl": "jdbc:derby:memory:old",
      "user": "admin",
      "encryptedPassword": "zzz",
      "targetTable": "legacy_t",
      "truncateTarget": true,
      "presql": "DELETE FROM x"
    }"""
    val migrated = ConfigCodec.read(v1)
    assert(migrated.version == ConfigCodec.CurrentVersion)
    assert(migrated.targets == Seq(LoadTarget("jdbc:derby:memory:old", "admin", "zzz",
      "legacy_t", truncateTarget = true, presql = Some("DELETE FROM x"), postsql = None, None)))
    // idempotent: writing + re-reading the migrated config is stable
    assert(ConfigCodec.read(ConfigCodec.write(migrated)) == migrated)
  }

  test("special characters survive the codec") {
    val tricky = cfg.copy(s3Prefix = "b/quote\"back\\slash",
      targets = Seq(cfg.targets.head.copy(presql = Some("SELECT '\n\t\"'"))))
    assert(ConfigCodec.read(ConfigCodec.write(tricky)) ==
      tricky.copy(version = ConfigCodec.CurrentVersion))
  }
}
