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

  /** Parse `<root>/<key>` into (bucket, key) like the reference's s3Info
    * projection (`index.js:1576-1604`): bucket = first path segment after
    * the watch root, key = remainder. URL-decoding (C8) applied.
    */
  def toEvent(watchRoot: String)(path: String, size: Long, modMs: Long): FileEvent = {
    val normRoot = if (watchRoot.endsWith("/")) watchRoot else watchRoot + "/"
    val stripped0 = path.replaceFirst("^file:", "")
    val stripped = if (stripped0.startsWith(normRoot)) stripped0.substring(normRoot.length) else stripped0
    val decoded = java.net.URLDecoder.decode(stripped.replace("+", "%2B"), "UTF-8")
    decoded.split("/", 2) match {
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
