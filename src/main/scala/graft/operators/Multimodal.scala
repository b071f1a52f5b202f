package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery here is real and tested — schema, batched
  * per-partition processing, partition sizing, feature schema — while
  * the actual media decode is STUBBED (`decodeStub`): the codec
  * libraries are not available in this environment. Swapping in a real
  * decoder means replacing ONE function whose contract is
  * `Array[Byte] => DecodedMeta`; everything around it (the expensive
  * part at 100 TB: batching, partition sizing, avoiding per-row JNI
  * setup) is already in place.
  *
  * Scale notes: media blobs must never be shuffled — all feature
  * extraction is mapPartitions on the scan side, and downstream
  * operators see only the (small) feature columns. Partition sizing
  * should target ~128 MB of blobs (spark.sql.files.maxPartitionBytes).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      mime: String,
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_length: Int,
      /** STUB: stand-ins for decode outputs (width/height/duration...). */
      feat_checksum: Long,
      feat_entropy_q: Int,
      feature_vec: Array[Float])

  /** ??? in spirit: a deterministic fake decoder. Real implementation
    * would parse the container format and decode frames/samples. The
    * fake derives stable pseudo-features from the bytes so the plumbing
    * is testable end-to-end.
    */
  def decodeStub(content: Array[Byte], dim: Int = 8): (Long, Int, Array[Float]) = {
    var checksum = 1125899906842597L
    var i = 0
    while (i < content.length) { checksum = 31 * checksum + content(i); i += 1 }
    val hist = new Array[Int](4)
    content.foreach(b => hist((b & 0xFF) % 4) += 1)
    val entropyQ = hist.max - hist.min
    val vec = Array.tabulate(dim)(d =>
      ((checksum >> (d * 8)) & 0xFF).toFloat / 255f)
    (checksum, entropyQ, vec)
  }

  /** Batched per-partition feature extraction — the shape a real decoder
    * plugs into. One decoder init per partition (not per row), rows
    * streamed through it.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
                      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize decoder/codec context HERE, once
      rows.map { r =>
        val (checksum, entropyQ, vec) = decodeStub(r.content, dim)
        MediaFeatures(r.media_id, r.modality, r.content.length, checksum, entropyQ, vec)
      }
    }
  }

  /** Resize/frame-sample analogue: derive a bounded-size binary (e.g.
    * thumbnail) per record — demonstrates binary-in/binary-out transforms
    * without shuffling originals.
    */
  def thumbnail(spark: SparkSession, media: Dataset[MediaRecord],
                maxBytes: Int = 64): DataFrame = {
    import spark.implicits._
    media.map(r => (r.media_id, r.modality, r.content.take(maxBytes)))
      .toDF("media_id", "modality", "thumb")
  }

  /** Wrap a text/doc table as pseudo-media for pipeline testing where no
    * real binary corpus exists: content = utf-8 bytes.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame,
                    idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "image", text.getBytes("UTF-8"), "application/octet-stream", "doc") }
  }
}
