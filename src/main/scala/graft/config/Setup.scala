package graft.config

import java.nio.file.{Files, Paths}
import graft.core._

/** File-driven setup — the reference's `setup-file.js` (465 LoC config
  * waterfall) re-expressed as validate → translate → persist. The input
  * is the same flat JSON shape `setup-file.js` consumes (`config.json`
  * keys: s3Prefix, clusterEndpoint, ..., df, manifestBucket, ...); the
  * output is a persisted [[graft.core.LoadConfig]] ready for
  * `Pipeline.start`.
  *
  * Validation rules mirror `setup.js:213-258` / `setup-file.js` exactly:
  * required-not-null fields, the five-format allow-list, CSV delimiter
  * required iff format is CSV, int fields must parse, Y/N booleans via
  * the reference's truthy set (common.js:371-382).
  */
object Setup {

  final case class SetupException(field: String, msg: String)
      extends IllegalArgumentException(s"$field: $msg")

  val AllowedFormats: Seq[String] = Seq("CSV", "JSON", "AVRO", "PARQUET", "ORC")

  /** common.js getBooleanValue: TRUE/1/YES/Y (case-insensitive) = true. */
  def boolValue(v: Any): Boolean = v match {
    case b: Boolean => b
    case s: String  => Seq("TRUE", "1", "YES", "Y").contains(s.toUpperCase)
    case _          => false
  }

  /** common.js getIntValue: must parse or setup fails. */
  def intValue(field: String, v: Any): Int = v match {
    case i: Int    => i
    case l: Long   => l.toInt
    case d: Double => d.toInt
    case s: String =>
      try s.trim.toInt
      catch { case _: NumberFormatException =>
        throw SetupException(field, s"Value '$s' is not a Number") }
    case other => throw SetupException(field, s"Value '$other' is not a Number")
  }

  /** The reference's connection-string assembly (`index.js:1236-1252`),
    * JDBC-flavored: endpoint + port, optional database, optional
    * non-validating SSL.
    */
  def buildJdbcUrl(endpoint: String, port: Int, db: Option[String],
                   useSSL: Boolean): String = {
    val base = s"jdbc:postgresql://$endpoint:$port" + db.map("/" + _).getOrElse("")
    if (useSSL) base + "?ssl=true&sslfactory=org.postgresql.ssl.NonValidatingFactory"
    else base
  }

  /** C11 escape hatch (`_OVERRIDE_DBSTRING`, `index.js:1245-1250`): an
    * operator can override the connection string under incident without
    * touching stored config. Like the reference, resolution happens at
    * CONNECTION time (JdbcWriter), never at setup: the stored config
    * always holds the assembled URL, so a temporary incident endpoint
    * (possibly with embedded credentials) can't outlive the incident by
    * being baked into config. The JVM property form (same name) exists
    * for tests and single-process operation.
    */
  val OverrideEnvVar = "GRAFT_OVERRIDE_DBSTRING"
  def resolveJdbcUrl(assembled: String,
                     env: String => Option[String] =
                       k => sys.props.get(k).orElse(sys.env.get(k))): String =
    env(OverrideEnvVar).filter(_.nonEmpty).getOrElse(assembled)

  /** `setup-file.js:83-108` s3Prefix normalization: strip s3://, bucket
    * alone stays bare, otherwise right-trim "/".
    */
  def normalizePrefix(raw: String): String = {
    val stripped = raw.replace("s3://", "")
    if (!stripped.contains("/")) stripped else stripped.replaceAll("/$", "")
  }

  /** Validate a setup-file JSON document and translate it to LoadConfig.
    * `encryptPassword` is the kmsCrypto.encrypt seam — pass
    * `keystore.encrypt`.
    */
  def fromJson(json: String,
               encryptPassword: String => String = identity): LoadConfig = {
    val v = Json.parse(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw SetupException("config", "setup file must be a JSON object")
    }
    fromMap(v, encryptPassword)
  }

  /** Cluster-target validation core, shared by initial setup and
    * [[addClusterEndpoint]]: endpoint/port/user/password/table are
    * required with the reference's exact messages; the URL is assembled,
    * never taken raw.
    */
  def targetFromMap(v: Map[String, Any],
                    encryptPassword: String => String = identity): LoadTarget = {
    def opt(k: String): Option[String] =
      v.get(k).map(_.toString).filter(_.nonEmpty)
    def required(k: String, msg: String): String =
      opt(k).getOrElse(throw SetupException(k, msg))
    val endpoint = required("clusterEndpoint", "You Must Provide a Cluster Endpoint")
    val port = intValue("clusterPort",
      v.getOrElse("clusterPort", throw SetupException("clusterPort", "You Must Provide a Cluster Port")))
    val user = required("userName", "You Must Provide a Username")
    val pwd = required("userPwd", "You Must Provide a Password")
    val table = required("table", "You Must Provide a Table Name")
    LoadTarget(
      jdbcUrl = buildJdbcUrl(endpoint, port, opt("clusterDB"),
        v.get("useSSL").exists(boolValue)),
      user = user,
      encryptedPassword = encryptPassword(pwd),
      targetTable = table,
      truncateTarget = v.get("truncateTable").exists(boolValue),
      presql = opt("presql"),
      postsql = opt("postsql"),
      columnList = opt("columnList").map(_.split(",").map(_.trim).toSeq))
  }

  /** `addAdditionalClusterEndpoint.js:1-225` parity: validate a NEW
    * cluster target with the same rules as setup and append it to an
    * existing stored config — subsequent loads fan out to every target
    * (T9). Returns the updated config, or None when no config exists for
    * the prefix.
    */
  def addClusterEndpoint(store: ConfigStore, s3Prefix: String, v: Map[String, Any],
                         encryptPassword: String => String = identity): Option[LoadConfig] = {
    val t = targetFromMap(v, encryptPassword)
    store.update(normalizePrefix(s3Prefix), c => c.copy(targets = c.targets :+ t))
  }

  /** `updateConfig.js` / `common.js:772-806` parity: set ONE named
    * config attribute (string-typed on the wire, like the reference's
    * DynamoDB `S` value), or REMOVE it when the value is empty — which
    * resets optionals to None and scalars to their defaults. Attribute
    * names are the setup-file keys. Unknown or structurally-typed
    * attributes (targets, jsonPaths) are refused loudly rather than
    * silently corrupting a typed config — use `--add-endpoint`/setup
    * for those.
    */
  def updateConfigAttribute(store: ConfigStore, s3Prefix: String,
                            attribute: String, value: Option[String]): Option[LoadConfig] = {
    val v = value.filter(_.nonEmpty)
    def set(f: (LoadConfig, Option[String]) => LoadConfig): LoadConfig => LoadConfig =
      c => f(c, v)
    val mutate: LoadConfig => LoadConfig = attribute match {
      case "df" => set((c, o) => o.map { s =>
        val up = s.toUpperCase
        if (!AllowedFormats.contains(up))
          throw SetupException("df", s"Value must be one of ${AllowedFormats.mkString(",")}")
        c.copy(dataFormat = DataFormat.parse(up))
      }.getOrElse(c.copy(dataFormat = DataFormat.Csv)))
      case "csvDelimiter" => set((c, o) => c.copy(csvDelimiter = o.getOrElse(",")))
      case "ignoreCsvHeader" => set((c, o) => c.copy(ignoreCsvHeader = o.exists(boolValue)))
      case "batchSize" => set((c, o) =>
        c.copy(batchSize = o.map(intValue("batchSize", _)).getOrElse(1000)))
      case "batchSizeBytes" => set((c, o) =>
        c.copy(batchSizeBytes = o.map(intValue("batchSizeBytes", _).toLong)))
      case "batchTimeoutSecs" => set((c, o) =>
        c.copy(batchTimeoutSecs = o.map(intValue("batchTimeoutSecs", _))))
      case "filenameFilterRegex" => set((c, o) => c.copy(filenameFilterRegex = o))
      case "successTopic" => set((c, o) => c.copy(successTopic = o))
      case "failureTopic" => set((c, o) => c.copy(failureTopic = o))
      case "compression" => set((c, o) => c.copy(compression = o))
      // manifestDir/failedManifestDir are stored as the composite
      // "$bucket/$prefix" ([[fromMap]]); updating one wire attribute must
      // replace only its segment, never the whole composite. The bucket
      // half is shared by both composites, exactly as in fromMap.
      case "manifestBucket" => set((c, o) => o.map { b =>
        c.copy(
          manifestDir = Some(s"$b/${dirSegment(c.manifestDir, "manifestBucket")._2}"),
          failedManifestDir =
            Some(s"$b/${dirSegment(c.failedManifestDir, "manifestBucket")._2}"))
      }.getOrElse(throw SetupException("manifestBucket",
        "manifestBucket is required and cannot be removed")))
      case "manifestPrefix" => set((c, o) => o.map { p =>
        c.copy(manifestDir = Some(s"${dirSegment(c.manifestDir, "manifestPrefix")._1}/$p"))
      }.getOrElse(throw SetupException("manifestPrefix",
        "manifestPrefix is required and cannot be removed")))
      case "failedManifestPrefix" => set((c, o) => o.map { p =>
        c.copy(failedManifestDir =
          Some(s"${dirSegment(c.failedManifestDir, "failedManifestPrefix")._1}/$p"))
      }.getOrElse(throw SetupException("failedManifestPrefix",
        "failedManifestPrefix is required and cannot be removed")))
      case other =>
        throw SetupException(other, s"Attribute '$other' is not updatable via updateConfig")
    }
    store.update(normalizePrefix(s3Prefix), mutate)
  }

  /** Split a stored "$bucket/$prefix" composite into its halves; refuse
    * to guess when the stored value is absent or has no prefix half.
    */
  private def dirSegment(d: Option[String], attr: String): (String, String) =
    d.map(_.split("/", 2)) match {
      case Some(Array(b, p)) => (b, p)
      case _ => throw SetupException(attr,
        s"No existing bucket/prefix composite to update for '$attr'")
    }

  /** The shared validate-and-translate core: both the file mode and the
    * interactive waterfall land here.
    */
  def fromMap(v: Map[String, Any],
              encryptPassword: String => String = identity): LoadConfig = {
    def opt(k: String): Option[String] =
      v.get(k).map(_.toString).filter(_.nonEmpty) // common.js blank()
    def required(k: String, msg: String): String =
      opt(k).getOrElse(throw SetupException(k, msg))

    val s3Prefix = normalizePrefix(
      required("s3Prefix", "You Must Provide an S3 Bucket Name, and optionally a Prefix"))

    val df = required("df", "You Must Provide a Data Format").toUpperCase
    if (!AllowedFormats.contains(df))
      throw SetupException("df", s"Value must be one of ${AllowedFormats.mkString(",")}")

    val csvDelimiter =
      if (df == "CSV") required("csvDelimiter", "You Must the Delimiter for CSV Input")
      else ","

    // jsonpaths: inline array, or a jsonpaths-file location read at setup
    // time ({"jsonpaths": ["$.a", ...]} — the Redshift file format)
    val jsonPaths: Option[Seq[String]] =
      if (df != "JSON" && df != "AVRO") None
      else v.get("jsonPaths") match {
        case Some(l: List[_]) => Some(l.map(_.toString))
        case Some(s: String) if s.nonEmpty =>
          val doc = Json.parse(Files.readString(Paths.get(s)))
            .asInstanceOf[Map[String, Any]]
          doc.get("jsonpaths").collect { case l: List[_] => l.map(_.toString) }
        case _ => None
      }

    val target = targetFromMap(v, encryptPassword)

    val manifestBucket = required("manifestBucket",
      "You Must Provide a Bucket Name for Manifest File Storage")
    val manifestPrefix = required("manifestPrefix", "You Must Provide a Prefix for Manifests")
    val failedManifestPrefix = required("failedManifestPrefix",
      "You Must Provide a Prefix for Manifests")

    LoadConfig(
      s3Prefix = s3Prefix,
      dataFormat = DataFormat.parse(df),
      csvDelimiter = csvDelimiter,
      ignoreCsvHeader = v.get("ignoreCsvHeader").exists(boolValue),
      jsonPaths = jsonPaths,
      batchSize = v.get("batchSize").map(intValue("batchSize", _)).getOrElse(1000),
      batchSizeBytes = v.get("batchSizeBytes").map(intValue("batchSizeBytes", _).toLong),
      batchTimeoutSecs = v.get("batchTimeoutSecs").map(intValue("batchTimeoutSecs", _)),
      // copyOptions free text (q_copyOptions) → reader option passthrough
      readerOptions = opt("copyOptions").map(_.split(",").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, value) => Some(k.trim -> value.trim)
          case _ => None
        }
      }.toMap).getOrElse(Map.empty),
      filenameFilterRegex = opt("filenameFilter"),
      targets = Seq(target),
      manifestDir = Some(s"$manifestBucket/$manifestPrefix"),
      failedManifestDir = Some(s"$manifestBucket/$failedManifestPrefix"),
      successTopic = opt("successTopic"),
      failureTopic = opt("failureTopic"))
  }

  /** The interactive question waterfall (`setup.js:423-458` order), as a
    * pure function of an `ask` callback so tests can script answers.
    * Blank answers mean "skip" for optional fields, exactly like the
    * reference's `common.blank`; required-field and format validation
    * happen in [[fromMap]] after the last question, mirroring the
    * reference's per-question validators.
    */
  val Questions: Seq[(String, String)] = Seq(
    "s3Prefix" -> "Enter the S3 Bucket & Prefix to watch for files",
    "filenameFilter" -> "Enter a Filename Filter Regex",
    "clusterEndpoint" -> "Enter the Cluster Endpoint",
    "clusterPort" -> "Enter the Cluster Port",
    "useSSL" -> "Does your cluster use SSL? (Y/N)",
    "clusterDB" -> "Enter the Database Name",
    "table" -> "Enter the Table to be Loaded",
    "columnList" -> "Enter the comma-delimited column list (or NULL for all columns)",
    "truncateTable" -> "Should the Table be Truncated before Load? (Y/N)",
    "userName" -> "Enter the Database Username",
    "userPwd" -> "Enter the Database Password",
    "df" -> "Enter the Data Format (CSV, JSON, AVRO, PARQUET, and ORC)",
    "csvDelimiter" -> "Enter the CSV Delimiter",
    "ignoreCsvHeader" -> "Ignore Header (first line) of the CSV file? (Y/N)",
    "jsonPaths" -> "Enter the JSON Paths File Location (or NULL for Auto)",
    "manifestBucket" -> "Enter the Bucket for COPY Manifests",
    "manifestPrefix" -> "Enter the Prefix for Manifests",
    "failedManifestPrefix" -> "Enter the Prefix to use for Failed Load Manifest Storage",
    "successTopic" -> "Enter the Topic ARN for Successful Loads",
    "failureTopic" -> "Enter the Topic ARN for Failed Loads",
    "batchSize" -> "How many files should be buffered before loading?",
    "batchSizeBytes" -> "How many bytes should be buffered before loading? (or NULL)",
    "batchTimeoutSecs" -> "How old should we allow a Batch to be before loading (seconds)?",
    "copyOptions" -> "Additional Copy Options (k=v, comma separated, or NULL)")

  /** Conditional questions, as in setup.js: delimiter only for CSV,
    * jsonpaths only for JSON/AVRO.
    */
  private def applies(key: String, answers: Map[String, Any]): Boolean = key match {
    case "csvDelimiter" =>
      answers.get("df").exists(_.toString.equalsIgnoreCase("CSV"))
    case "jsonPaths" =>
      answers.get("df").map(_.toString.toUpperCase).exists(d => d == "JSON" || d == "AVRO")
    case _ => true
  }

  def interactive(ask: String => String,
                  encryptPassword: String => String = identity): LoadConfig = {
    val answers = Questions.foldLeft(Map.empty[String, Any]) { case (acc, (key, prompt)) =>
      if (!applies(key, acc)) acc
      else {
        val a = Option(ask(s"$prompt > ")).map(_.trim).getOrElse("")
        if (a.isEmpty || a.equalsIgnoreCase("NULL")) acc else acc + (key -> a)
      }
    }
    fromMap(answers, encryptPassword)
  }

  /** The CLI body: read the setup file, validate/translate, encrypt the
    * password with the keystore, persist into the config store. Returns
    * the stored config (the watch prefix is its s3Prefix).
    */
  def run(configFile: String, storeDir: String, keystoreDir: String): LoadConfig = {
    val ks = graft.crypto.Keystore(keystoreDir)
    val cfg = fromJson(Files.readString(Paths.get(configFile)), ks.encrypt)
    new ConfigStore(storeDir).put(cfg)
    cfg
  }

  /** `node setup-file.js config.json` / `node setup.js` analogue:
    * `runMain graft.config.Setup <configFile> <configStoreDir> <keystoreDir>`
    * or `runMain graft.config.Setup --interactive <configStoreDir> <keystoreDir>`.
    */
  def main(args: Array[String]): Unit = args match {
    case Array("--interactive", storeDir, keystoreDir) =>
      try {
        val ks = graft.crypto.Keystore(keystoreDir)
        val cfg = interactive(prompt => { Console.out.print(prompt); scala.io.StdIn.readLine() },
          ks.encrypt)
        new ConfigStore(storeDir).put(cfg)
        println(s"configured prefix ${cfg.s3Prefix} -> " +
          cfg.targets.map(_.targetTable).mkString(","))
      } catch {
        case e: SetupException => System.err.println(e.getMessage); sys.exit(2)
      }
    // addAdditionalClusterEndpoint.js as a CLI arm: same file shape as
    // setup, but only the cluster-target fields are read; the validated
    // target appends to the EXISTING config for s3Prefix
    case Array("--add-endpoint", configFile, storeDir, keystoreDir) =>
      try {
        val v = Json.parse(Files.readString(Paths.get(configFile)))
          .asInstanceOf[Map[String, Any]]
        val prefix = v.get("s3Prefix").map(_.toString).getOrElse(
          throw SetupException("s3Prefix", "You Must Provide an S3 Bucket Name, and optionally a Prefix"))
        val ks = graft.crypto.Keystore(keystoreDir)
        addClusterEndpoint(new ConfigStore(storeDir), prefix, v, ks.encrypt) match {
          case Some(cfg) =>
            println(s"prefix ${cfg.s3Prefix} now targets " +
              cfg.targets.map(_.targetTable).mkString(","))
          case None =>
            System.err.println(s"no existing config for prefix $prefix — run setup first")
            sys.exit(1)
        }
      } catch {
        case e: SetupException => System.err.println(e.getMessage); sys.exit(2)
      }
    case Array(configFile, storeDir, keystoreDir) =>
      try {
        val cfg = run(configFile, storeDir, keystoreDir)
        println(s"configured prefix ${cfg.s3Prefix} -> " +
          cfg.targets.map(_.targetTable).mkString(","))
      } catch {
        case e: SetupException => System.err.println(e.getMessage); sys.exit(2)
      }
    // updateConfig.js parity: set (or, with no value, remove) one attribute
    case arr if arr.length >= 4 && arr(0) == "--update" =>
      try {
        val (storeDir, prefix, attribute) = (arr(1), arr(2), arr(3))
        val value = arr.lift(4)
        Setup.updateConfigAttribute(new ConfigStore(storeDir), prefix, attribute, value) match {
          case Some(_) =>
            println(value match {
              case Some(vv) => s"Updated Attribute $attribute = $vv OK"
              case None     => s"Removed Attribute $attribute"
            })
          case None =>
            System.err.println(s"no existing config for prefix $prefix"); sys.exit(1)
        }
      } catch {
        case e: SetupException => System.err.println(e.getMessage); sys.exit(2)
      }
    case _ =>
      System.err.println(
        """usage: graft.config.Setup <configFile> <configStoreDir> <keystoreDir>
          |       graft.config.Setup --interactive <configStoreDir> <keystoreDir>
          |       graft.config.Setup --add-endpoint <endpointFile> <configStoreDir> <keystoreDir>
          |       graft.config.Setup --update <configStoreDir> <s3Prefix> <attribute> [value]""".stripMargin)
      sys.exit(2)
  }
}
