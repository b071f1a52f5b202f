package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.FileEvent

/** File-arrival event stream — the Spark replacement for the reference's
  * S3 `ObjectCreated` → Lambda wiring (`/root/reference/index.js:1548-1604`).
  *
  * Structured Streaming's file source does new-file discovery natively
  * (checkpointed listing), which replaces the reference's event admission
  * checks (S1) wholesale: every discovered path IS a created object. We
  * read with the `binaryFile` format but project ONLY metadata columns
  * (path/length/modificationTime) — the format supports column pruning, so
  * file contents are never read here; the Loader reads content later,
  * format-aware, from the manifest paths.
  *
  * Scale note: for millions of files per hour the listing source should be
  * swapped for a notification-backed source; the seam is this one function
  * returning Dataset[FileEvent].
  */
object FileEventSource {

  /** Control namespace: marker files under `<watchRoot>/graft-control/`
    * are consumed as control events, never as data. `unlink/<enc>` clears
    * one file's dedup entry from Batcher state (the Spark analogue of
    * the reference deleting the processed-files item so a re-injected
    * file is admitted — `common.js:842-916`).
    *
    * The namespace must NOT be hidden: Spark's file listing
    * (InMemoryFileIndex, shared by the binaryFile batch and streaming
    * sources) silently drops any path whose name starts with `.` or `_`,
    * so a dot-dir marker would never be discovered. Marker filenames are
    * prefixed `t-` for the same reason — URLEncoder leaves `.` and `_`
    * unescaped, so an encoded target could otherwise start with one.
    *
    * RESERVED NAME: because the namespace is visible, the first path
    * segment `graft-control` under a watch root cannot be used as a data
    * bucket — any `graft-control/unlink/...` object is consumed as a
    * control marker, never loaded.
    */
  val ControlDir = "graft-control"
  private val LegacyControlDir = ".graft-control"

  def encodeControlTarget(loadFile: String): String =
    "t-" + java.net.URLEncoder.encode(loadFile, "UTF-8")

  /** Parse `<root>/<key>` into (bucket, key) like the reference's s3Info
    * projection (`index.js:1576-1604`): bucket = first path segment after
    * the watch root, key = remainder.
    *
    * `decodeS3Keys` (C8, `index.js:1586`): S3 delivers event keys
    * URL-encoded, so sources fed from S3 events must percent-decode.
    * Spark's file listing delivers RAW filesystem paths (verified: a
    * literal `%20` or space arrives as-is), so decoding is OFF by
    * default — unconditional decoding would corrupt names containing
    * literal %xx sequences.
    */
  def toEvent(watchRoot: String, decodeS3Keys: Boolean = false)(
      path: String, size: Long, modMs: Long): FileEvent = {
    val normRoot = if (watchRoot.endsWith("/")) watchRoot else watchRoot + "/"
    val stripped0 = path.replaceFirst("^file:", "")
    val stripped = if (stripped0.startsWith(normRoot)) stripped0.substring(normRoot.length) else stripped0
    val decoded =
      if (decodeS3Keys) java.net.URLDecoder.decode(stripped.replace("+", "%2B"), "UTF-8")
      else stripped
    decoded.split("/", 2) match {
      case Array(dir @ (ControlDir | LegacyControlDir), rest) if rest.startsWith("unlink/") =>
        // Only new-namespace markers carry the "t-" filename prefix (it
        // exists to defeat InMemoryFileIndex's dot/underscore hiding);
        // legacy .graft-control markers never did, so stripping there
        // would corrupt an encoded target that legitimately starts with
        // "t-" and clear the wrong dedup entry.
        val enc = rest.stripPrefix("unlink/")
        val target = java.net.URLDecoder.decode(
          if (dir == ControlDir) enc.stripPrefix("t-") else enc, "UTF-8")
        target.split("/", 2) match {
          case Array(b, k) => FileEvent(b, k, size, modMs, unlink = true)
          case Array(b)    => FileEvent(b, "", size, modMs, unlink = true)
        }
      case Array(b, k) => FileEvent(b, k, size, modMs)
      case Array(b)    => FileEvent(b, "", size, modMs)
    }
  }

  import org.apache.spark.sql.types._

  /** binaryFile's fixed schema — streaming sources must declare it. */
  val BinaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming dataset of file events under `watchRoot/<bucket>/<key...>`. */
  def stream(spark: SparkSession, watchRoot: String, globFilter: Option[String] = None): Dataset[FileEvent] = {
    import spark.implicits._
    val reader = spark.readStream.format("binaryFile").schema(BinaryFileSchema)
      .option("recursiveFileLookup", "true")
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(watchRoot)
      .select(col("path"), col("length"), col("modificationTime").cast("long") * 1000)
      .as[(String, Long, Long)]
      .map { case (p, len, ts) => toEvent(watchRoot)(p, len, ts) }
  }

  /** Batch listing of the same shape — used by reprocessing ops (S4) and
    * tests. */
  def list(spark: SparkSession, watchRoot: String, globFilter: Option[String] = None): Dataset[FileEvent] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(watchRoot)
      .select(col("path"), col("length"), col("modificationTime").cast("long") * 1000)
      .as[(String, Long, Long)]
      .map { case (p, len, ts) => toEvent(watchRoot)(p, len, ts) }
  }
}
