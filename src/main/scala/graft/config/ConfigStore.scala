package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.core._

/** Durable per-prefix load configuration with versioned migrations —
  * the Spark-native replacement for the reference's
  * `LambdaRedshiftBatchLoadConfig` DynamoDB table + `upgrades.js`
  * (`/root/reference/common.js:148-163`, `upgrades.js:25-284`,
  * `setup.js:28-458`).
  *
  * Storage is one JSON file per prefix under a directory (small
  * control-plane data; broadcast to executors after load — never read
  * per task). Migrations follow the reference's idempotent
  * version-stamped pattern: every codec version can read its own output
  * and every older version's, and `load` rewrites old shapes forward —
  * the seam the reference implements with `semver`-gated conditional
  * writes (`index.js:181-190`).
  */
class ConfigStore(dir: String,
                  /** Applied to encrypted fields when migrating a pre-v3
                    * config forward — the `upgrades.js:117-233` seam: pass
                    * `old.decrypt andThen new.encrypt` when the keystore
                    * encoding changes. Never applied to already-current
                    * files, so re-reading is idempotent. */
                  reEncode: String => String = identity) {

  private def fileFor(prefix: String): Path =
    Paths.get(dir, java.net.URLEncoder.encode(prefix, "UTF-8") + ".json")

  def put(cfg: LoadConfig): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(fileFor(cfg.s3Prefix), ConfigCodec.write(cfg))
  }

  /** Read one config; an old on-disk shape is migrated AND persisted
    * forward (the reference's upgrade-once pattern: `upgrades.js` runs,
    * stamps the new version, and the next read takes the fast path).
    */
  def get(prefix: String): Option[LoadConfig] = {
    val f = fileFor(prefix)
    if (!Files.exists(f)) None
    else {
      val raw = Files.readString(f)
      val (cfg, migrated) = ConfigCodec.readVersioned(raw, reEncode)
      if (migrated) put(cfg)
      Some(cfg)
    }
  }

  /** Full scan — the analogue of the trigger-file sweep's config scan
    * (S3o). Configs are few; this list is what gets broadcast.
    */
  def all(): Map[String, LoadConfig] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Map.empty
    else Files.list(d).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .map { p =>
        val (cfg, migrated) = ConfigCodec.readVersioned(Files.readString(p), reEncode)
        if (migrated) put(cfg)
        cfg
      }
      .map(c => c.s3Prefix -> c)
      .toMap
  }

  /** updateConfig CLI parity (`common.js:772-806`): set/remove a field
    * and bump the version stamp.
    */
  def update(prefix: String, mutate: LoadConfig => LoadConfig): Option[LoadConfig] =
    get(prefix).map { cfg =>
      val updated = mutate(cfg).copy(version = ConfigCodec.CurrentVersion)
      put(updated)
      updated
    }
}

/** Hand-rolled JSON codec (no external deps available) with version-gated
  * migration on read. v1 was the single-target shape (reference's
  * pre-multi-cluster config, migrated by `upgrades.js:25-115`); v2 the
  * multi-target shape; v3 serializes every LoadConfig field (v2 silently
  * dropped readerOptions/manifest dirs/topics) and is the boundary at
  * which encrypted fields pass through the re-encode hook — the
  * `upgrades.js:117-233` encrypted-field migration analogue.
  */
object ConfigCodec {
  val CurrentVersion = "3"

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def target(t: LoadTarget): String =
    s"""{"jdbcUrl":${q(t.jdbcUrl)},"user":${q(t.user)},"encryptedPassword":${q(t.encryptedPassword)},""" +
      s""""targetTable":${q(t.targetTable)},"truncateTarget":${t.truncateTarget},""" +
      s""""presql":${t.presql.map(q).getOrElse("null")},"postsql":${t.postsql.map(q).getOrElse("null")},""" +
      s""""columnList":${t.columnList.map(_.map(q).mkString("[", ",", "]")).getOrElse("null")}}"""

  def write(c: LoadConfig): String =
    s"""{"version":${q(CurrentVersion)},"s3Prefix":${q(c.s3Prefix)},""" +
      s""""dataFormat":${q(c.dataFormat.name)},"csvDelimiter":${q(c.csvDelimiter)},""" +
      s""""ignoreCsvHeader":${c.ignoreCsvHeader},""" +
      s""""jsonPaths":${c.jsonPaths.map(_.map(q).mkString("[", ",", "]")).getOrElse("null")},""" +
      s""""batchSize":${c.batchSize},"batchSizeBytes":${c.batchSizeBytes.getOrElse(-1L)},""" +
      s""""batchTimeoutSecs":${c.batchTimeoutSecs.getOrElse(-1)},""" +
      s""""readerOptions":${
        c.readerOptions.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")},""" +
      s""""emptyAsNull":${c.emptyAsNull},"blanksAsNull":${c.blanksAsNull},""" +
      s""""compression":${c.compression.map(q).getOrElse("null")},""" +
      s""""filenameFilterRegex":${c.filenameFilterRegex.map(q).getOrElse("null")},""" +
      s""""manifestDir":${c.manifestDir.map(q).getOrElse("null")},""" +
      s""""failedManifestDir":${c.failedManifestDir.map(q).getOrElse("null")},""" +
      s""""successTopic":${c.successTopic.map(q).getOrElse("null")},""" +
      s""""failureTopic":${c.failureTopic.map(q).getOrElse("null")},""" +
      s""""currentBatch":${q(c.currentBatch)},""" +
      s""""targets":${c.targets.map(target).mkString("[", ",", "]")}}"""

  /** Minimal recursive-descent JSON reader (objects/arrays/strings/
    * numbers/bools/null) — enough for our own output plus legacy shapes.
    */
  def read(json: String): LoadConfig = readVersioned(json, identity)._1

  /** Parse + migrate. Returns (config, wasMigrated): pre-v3 shapes get
    * their encrypted fields passed through `reEncode` exactly once —
    * current-version files never touch the hook, so repeated reads are
    * idempotent (the `upgrades.js:117-233` contract).
    */
  def readVersioned(json: String,
                    reEncode: String => String): (LoadConfig, Boolean) = {
    val v = Json.parse(json).asInstanceOf[Map[String, Any]]
    val version = v.get("version").map(_.toString).getOrElse("1")
    version match {
      case "1" => (reEncodeTargets(migrateV1(v), reEncode), true)
      case "2" => (reEncodeTargets(fromV2(v), reEncode), true)
      case _   => (fromV2(v), false)
    }
  }

  private def reEncodeTargets(c: LoadConfig, reEncode: String => String): LoadConfig =
    c.copy(targets = c.targets.map(t =>
      if (t.encryptedPassword.nonEmpty)
        t.copy(encryptedPassword = reEncode(t.encryptedPassword))
      else t))

  private def str(v: Map[String, Any], k: String): Option[String] =
    v.get(k).collect { case s: String => s }

  private def fromV2(v: Map[String, Any]): LoadConfig = {
    val targets = v.getOrElse("targets", List.empty).asInstanceOf[List[Any]].map { t0 =>
      val t = t0.asInstanceOf[Map[String, Any]]
      LoadTarget(
        t("jdbcUrl").toString, t("user").toString, t("encryptedPassword").toString,
        t("targetTable").toString,
        t.get("truncateTarget").exists(_ == true),
        str(t, "presql"), str(t, "postsql"),
        t.get("columnList").collect { case l: List[_] => l.map(_.toString) })
    }
    LoadConfig(
      s3Prefix = v("s3Prefix").toString,
      dataFormat = DataFormat.parse(v("dataFormat").toString),
      csvDelimiter = v.getOrElse("csvDelimiter", ",").toString,
      ignoreCsvHeader = v.get("ignoreCsvHeader").exists(_ == true),
      jsonPaths = v.get("jsonPaths").collect { case l: List[_] => l.map(_.toString) },
      batchSize = v.getOrElse("batchSize", 1000d).asInstanceOf[Double].toInt,
      batchSizeBytes = v.get("batchSizeBytes").map(_.asInstanceOf[Double].toLong).filter(_ >= 0),
      batchTimeoutSecs = v.get("batchTimeoutSecs").map(_.asInstanceOf[Double].toInt).filter(_ >= 0),
      readerOptions = v.get("readerOptions")
        .collect { case m: Map[_, _] =>
          m.map { case (k, value) => k.toString -> value.toString } }
        .getOrElse(Map.empty),
      emptyAsNull = v.get("emptyAsNull").exists(_ == true),
      blanksAsNull = v.get("blanksAsNull").exists(_ == true),
      compression = str(v, "compression"),
      filenameFilterRegex = str(v, "filenameFilterRegex"),
      manifestDir = str(v, "manifestDir"),
      failedManifestDir = str(v, "failedManifestDir"),
      successTopic = str(v, "successTopic"),
      failureTopic = str(v, "failureTopic"),
      targets = targets,
      currentBatch = v.getOrElse("currentBatch", "").toString,
      version = CurrentVersion)
  }

  /** v1 → v2: single flat target fields become `targets[0]` — the same
    * single→multi-cluster rewrite as `upgrades.js:25-115`.
    */
  private def migrateV1(v: Map[String, Any]): LoadConfig = {
    val base = fromV2(v + ("targets" -> List.empty))
    val target = for {
      url <- str(v, "jdbcUrl")
      table <- str(v, "targetTable")
    } yield LoadTarget(url, str(v, "user").getOrElse(""),
      str(v, "encryptedPassword").getOrElse(""), table,
      v.get("truncateTarget").exists(_ == true),
      str(v, "presql"), str(v, "postsql"), None)
    base.copy(targets = target.toSeq, version = CurrentVersion)
  }
}

/** Tiny JSON parser (strings, numbers as Double, bools, null, arrays,
  * objects) — zero-dependency control-plane use only.
  */
object Json {
  def parse(s: String): Any = new P(s).value()

  private class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => number()
      }
    }
    private def obj(): Map[String, Any] = {
      i += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (s(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); val k = string(); ws()
        require(s(i) == ':'); i += 1
        val v = value()
        if (v != null) b += (k -> v)
        ws()
        if (s(i) == ',') i += 1 else { require(s(i) == '}'); i += 1; done = true }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      i += 1; ws()
      val b = List.newBuilder[Any]
      if (s(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value(); ws()
        if (s(i) == ',') i += 1 else { require(s(i) == ']'); i += 1; done = true }
      }
      b.result()
    }
    private def string(): String = {
      require(s(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def number(): Double = {
      val start = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      s.substring(start, i).toDouble
    }
  }
}
