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

  test("EVERY LoadConfig field survives write∘read (fully-populated identity)") {
    // fields v2 silently dropped: readerOptions, manifest dirs, topics
    val full = cfg.copy(
      readerOptions = Map("multiLine" -> "true", "quote" -> "\""),
      manifestDir = Some("/m"), failedManifestDir = Some("/fm"),
      successTopic = Some("ok-topic"), failureTopic = Some("fail-topic"))
    val got = ConfigCodec.read(ConfigCodec.write(full))
    assert(got == full.copy(version = ConfigCodec.CurrentVersion))
  }

  test("v2→v3 migration re-encodes encrypted fields exactly once (upgrades.js:117-233)") {
    // fake codec swap: old scheme = raw, new scheme = base64
    val reEncode = (s: String) =>
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val dir = Files.createTempDirectory("graft-cfg").toString
    // hand-write a v2 file (current writer always emits v3)
    val v2Json = ConfigCodec.write(cfg).replaceFirst("\"version\":\"3\"", "\"version\":\"2\"")
    val file = java.nio.file.Paths.get(dir,
      java.net.URLEncoder.encode(cfg.s3Prefix, "UTF-8") + ".json")
    Files.createDirectories(file.getParent)
    Files.writeString(file, v2Json)

    val store = new ConfigStore(dir, reEncode)
    val got = store.get(cfg.s3Prefix).get
    assert(got.targets.head.encryptedPassword == reEncode("enc-pw"))
    // migration persisted forward: the on-disk file is now v3...
    assert(Files.readString(file).contains("\"version\":\"3\""))
    // ...so a second read must NOT re-apply the hook (idempotence)
    assert(store.get(cfg.s3Prefix).get.targets.head.encryptedPassword == reEncode("enc-pw"))
  }

  test("special characters survive the codec") {
    val tricky = cfg.copy(s3Prefix = "b/quote\"back\\slash",
      targets = Seq(cfg.targets.head.copy(presql = Some("SELECT '\n\t\"'"))))
    assert(ConfigCodec.read(ConfigCodec.write(tricky)) ==
      tricky.copy(version = ConfigCodec.CurrentVersion))
  }
}
