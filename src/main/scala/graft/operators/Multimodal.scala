package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The IMAGE leg is real: PNG/JPEG/GIF/BMP decode through the JDK's
  * `javax.imageio` in the per-partition loop, yielding true
  * width/height/channels and a luminance-histogram feature vector.
  * Audio/video decode stays STUBBED (`decodeStub`) — no codec libraries
  * exist in this environment; swapping one in means replacing ONE
  * function whose contract is `Array[Byte] => features`. Everything
  * around it (the expensive part at 100 TB: batching, partition sizing,
  * one decoder init per partition, avoiding per-row JNI setup) is real.
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
      /** Real decode outputs for images; -1 when the blob isn't a
        * decodable image (or modality is audio/video — stub path). */
      width: Int,
      height: Int,
      channels: Int,
      feat_checksum: Long,
      feat_entropy_q: Int,
      feature_vec: Array[Float])

  /** Deterministic fake decoder for the modalities whose codecs aren't
    * available here (audio/video). Derives stable pseudo-features from
    * the bytes so the plumbing is testable end-to-end.
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

  /** Real image decode via JDK ImageIO. Returns (width, height,
    * channels, normalized dim-bucket luminance histogram), or None when
    * the bytes aren't a readable image. Pixel work is bounded: at most
    * ~4096 pixels are sampled on a uniform grid regardless of image
    * size, so a pathological 100-megapixel input costs the same as a
    * thumbnail.
    */
  def decodeImage(content: Array[Byte], dim: Int = 8): Option[(Int, Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val ch = img.getColorModel.getNumComponents
      val strideX = math.max(1, w / 64)
      val strideY = math.max(1, h / 64)
      val hist = new Array[Int](dim)
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 +
                     ((rgb >> 8) & 0xFF) * 587 +
                     (rgb & 0xFF) * 114) / 1000
          hist(math.min(dim - 1, lum * dim / 256)) += 1
          n += 1
          x += strideX
        }
        y += strideY
      }
      val vec = hist.map(c => if (n == 0) 0f else c.toFloat / n)
      Some((w, h, ch, vec))
    }
  }

  /** Batched per-partition feature extraction. Image blobs decode for
    * real (ImageIO); non-image or undecodable blobs take the stub path
    * with sentinel dimensions. Decoder init happens once per partition
    * (ImageIO's disk cache is disabled there — temp-file churn per image
    * would dominate at scale).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
                      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init: no temp-file cache, one-time cost
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (checksum, entropyQ, stubVec) = decodeStub(r.content, dim)
        val decoded = if (r.modality == "image") decodeImage(r.content, dim) else None
        decoded match {
          case Some((w, h, ch, vec)) =>
            MediaFeatures(r.media_id, r.modality, r.content.length, w, h, ch,
              checksum, entropyQ, vec)
          case None =>
            MediaFeatures(r.media_id, r.modality, r.content.length, -1, -1, -1,
              checksum, entropyQ, stubVec)
        }
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

  final case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      /** fraction of the stream the frame was sampled at, [0, 1). */
      ts_frac: Double,
      frame: Array[Byte])

  /** Frame-sampling analogue for video/audio blobs: emit `n` evenly
    * spaced bounded-size frames per record. The DECODE is stubbed (no
    * codec libs here — a real implementation seeks keyframes/samples in
    * the container), but the Spark shape is the real one: per-partition
    * batched iteration, one output row per sampled frame with bounded
    * bytes, full blobs never duplicated into more than their own
    * partition's task and never shuffled — downstream sees only frames.
    */
  def frameSample(spark: SparkSession, media: Dataset[MediaRecord],
                  n: Int = 4, frameBytes: Int = 256): Dataset[SampledFrame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: open the demuxer context once per partition here
      rows.flatMap { r =>
        val len = r.content.length
        if (len == 0) Iterator.empty
        else Iterator.tabulate(n) { i =>
          val off = (len.toLong * i / n).toInt
          SampledFrame(r.media_id, i, i.toDouble / n,
            r.content.slice(off, math.min(len, off + frameBytes)))
        }
      }
    }
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

  /** Deterministic synthetic PNG corpus derived from a doc table: each
    * document renders to a small real PNG (dimensions from id/text
    * length, pixels from an id-seeded LCG), ENCODED with ImageIO on the
    * executors — so the decode leg exercises genuine image bytes with
    * known ground-truth dimensions, no external corpus needed.
    */
  def syntheticImages(spark: SparkSession, docs: DataFrame,
                      idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), length(col(textCol)).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, textLen) =>
          val w = 8 + (textLen % 17)
          val h = 8 + (id % 13).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var seed = id * 6364136223846793005L + 1442695040888963407L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              seed = seed * 6364136223846793005L + 1442695040888963407L
              img.setRGB(x, y, ((seed >>> 24) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaRecord(id, "image", baos.toByteArray, "image/png", "synthetic")
        }
      }
  }
}
