package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The IMAGE leg is real: PNG/JPEG/GIF/BMP decode through the JDK's
  * `javax.imageio` in the per-partition loop, yielding true
  * width/height/channels and a luminance-histogram feature vector.
  * The AUDIO leg is real for the JDK-supported containers (WAV/AIFF/AU,
  * PCM encodings) via `javax.sound.sampled`: true sample rate, frame
  * count, channels and a bounded-sample amplitude histogram. The VIDEO
  * leg is real for the one multi-frame container the JDK can decode —
  * animated GIF (`decodeVideo`: true width/height/frameCount + a
  * temporal luminance profile); MP4/WebM have no JDK codec, so they
  * carry real CONTAINER METADATA ([[MediaContainers]]: moov/EBML
  * width/height/duration/codec/sample-count) with stub frame features —
  * swapping a codec in means replacing ONE function whose contract is
  * `Array[Byte] => features`. Everything around the codecs (the
  * expensive part at 100 TB: batching, partition sizing, one decoder
  * init per partition, avoiding per-row JNI setup) is shared and real.
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
      /** Real decode outputs. Images: pixel width/height/components.
        * Audio: width = sample rate (Hz), height = frame count,
        * channels = channels. Video (animated GIF): pixel width/height,
        * channels = frame count. -1s when the blob doesn't decode. */
      width: Int,
      height: Int,
      channels: Int,
      feat_checksum: Long,
      feat_entropy_q: Int,
      feature_vec: Array[Float])

  /** Deterministic fake decoder for blobs with no JDK codec (e.g. MP4/
    * WebM video) and the fallback fingerprint for undecodable bytes.
    * Derives stable pseudo-features so the plumbing stays testable
    * end-to-end whatever the corpus contains.
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

  /** Real audio decode via JDK `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM_SIGNED/PCM_UNSIGNED encodings — the JDK's shipped
    * support). Returns (sampleRateHz, frames, channels, normalized
    * dim-bucket amplitude histogram), or None when the bytes aren't
    * readable audio. Sample work is bounded like [[decodeImage]]'s: at
    * most ~4096 frames are read on a uniform stride regardless of clip
    * length, so an hour-long input costs the same as a chirp.
    */
  def decodeAudio(content: Array[Byte], dim: Int = 8): Option[(Int, Int, Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (ais == null) None
    else try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val pcm = enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED
      val frames = ais.getFrameLength
      val frameSize = fmt.getFrameSize
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      if (!pcm || frames <= 0 || frameSize <= 0 || bytesPerSample < 1) None
      else {
        val rate = math.round(fmt.getSampleRate)
        val ch = fmt.getChannels
        val stride = math.max(1L, frames / 4096L)
        val hist = new Array[Int](dim)
        val buf = new Array[Byte](frameSize)
        var read = 0L
        var n = 0
        var eof = false
        while (read < frames && !eof) {
          if (ais.read(buf) != frameSize) eof = true
          else {
            // first channel's sample → amplitude bucket; 8-bit WAV is
            // unsigned, deeper PCM is signed little/big per the format
            val amp = math.abs(sampleValue(buf, bytesPerSample, fmt)) // in [0,1]
            hist(math.min(dim - 1, (amp * dim).toInt)) += 1
            n += 1
            if (stride > 1) { ais.skip((stride - 1) * frameSize); read += stride - 1 }
          }
          read += 1
        }
        val vec = hist.map(c => if (n == 0) 0f else c.toFloat / n)
        Some((rate, frames.toInt, ch, vec))
      }
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Real video decode for the one multi-frame container the JDK ships
    * a codec for: animated GIF via ImageIO's sequence reader. Returns
    * (width, height, frameCount, temporal luminance profile — the mean
    * luminance of `dim` evenly spaced frames, normalized to [0,1]), or
    * None when the bytes aren't a readable GIF. Work is bounded twice
    * over: at most `dim` frames decode (seek-by-index, not a full
    * demux) and each frame samples ≤ ~4096 pixels on a uniform grid,
    * so clip length and resolution never change the cost.
    */
  def decodeVideo(content: Array[Byte], dim: Int = 8): Option[(Int, Int, Int, Array[Float])] = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis, false)
      val nFrames = reader.getNumImages(true)
      if (nFrames <= 0) None
      else {
        val vec = new Array[Float](dim)
        // dims from frame 0, not the last sampled frame: real-world GIFs
        // store delta frames smaller than the logical screen
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        var d = 0
        while (d < dim) {
          val idx = math.min(nFrames - 1, nFrames.toLong * d / dim).toInt
          val img = reader.read(idx)
          val fw = img.getWidth
          val fh = img.getHeight
          val strideX = math.max(1, fw / 64)
          val strideY = math.max(1, fh / 64)
          var sum = 0L
          var n = 0
          var y = 0
          while (y < fh) {
            var x = 0
            while (x < fw) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xFF) * 299 +
                      ((rgb >> 8) & 0xFF) * 587 +
                      (rgb & 0xFF) * 114) / 1000
              n += 1
              x += strideX
            }
            y += strideY
          }
          vec(d) = if (n == 0) 0f else sum.toFloat / n / 255f
          d += 1
        }
        Some((w, h, nFrames, vec))
      }
    } catch { case _: Exception => None }
    finally { reader.dispose(); iis.close() }
  }

  /** First-channel normalized |sample| of one PCM frame, in [0, 1]. */
  private def sampleValue(frame: Array[Byte], bytesPerSample: Int,
                          fmt: javax.sound.sampled.AudioFormat): Double = {
    val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    var v = 0L
    var i = 0
    while (i < bytesPerSample) {
      val idx = if (fmt.isBigEndian) i else bytesPerSample - 1 - i
      v = (v << 8) | (frame(idx) & 0xFFL)
      i += 1
    }
    val bits = bytesPerSample * 8
    val raw =
      if (!signed) v - (1L << (bits - 1)) // center unsigned PCM
      else if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) // sign-extend
      else v
    math.min(1.0, math.abs(raw.toDouble) / (1L << (bits - 1)).toDouble)
  }

  /** Batched per-partition feature extraction. Image and audio blobs
    * decode for real (ImageIO / javax.sound); GIF video decodes for
    * real too, and MP4/WebM video falls back to CONTAINER METADATA
    * ([[MediaContainers]] — real width/height/sample-count from the
    * moov/EBML atoms, stub feature vector: no JVM codec exists for the
    * frames). Undecodable blobs take the stub path with sentinel
    * dimensions. Decoder init happens once per partition (ImageIO's
    * disk cache is disabled there — temp-file churn per blob would
    * dominate at scale).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
                      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init: no temp-file cache, one-time cost
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (checksum, entropyQ, stubVec) = decodeStub(r.content, dim)
        val decoded = r.modality match {
          case "image" => decodeImage(r.content, dim)
          case "audio" => decodeAudio(r.content, dim)
          case "video" => decodeVideo(r.content, dim)
            .orElse(MediaContainers.parseVideoMeta(r.content)
              .map(m => (m.width, m.height, m.nSamples, stubVec)))
          case _ => None
        }
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

  /** Deterministic synthetic WAV corpus — the audio analogue of
    * [[syntheticImages]]: each document renders to a short PCM_SIGNED
    * 16-bit mono WAV (sample rate a fixed 8000 Hz, frame count from the
    * text length, samples from an id-seeded LCG), encoded with
    * `javax.sound` on the executors, so the decode leg exercises genuine
    * container bytes with known ground-truth rate/frames/channels.
    */
  def syntheticAudio(spark: SparkSession, docs: DataFrame,
                     idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    docs.select(col(idCol).cast("long"), length(col(textCol)).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, textLen) =>
          val frames = 64 + (textLen % 97)
          val data = new Array[Byte](frames * 2)
          var seed = id * 2862933555777941757L + 3037000493L
          var i = 0
          while (i < frames) {
            seed = seed * 2862933555777941757L + 3037000493L
            val s = (seed >>> 48).toShort
            data(2 * i) = (s & 0xFF).toByte // little-endian 16-bit PCM
            data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new AudioFormat(8000f, 16, 1, true, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
          MediaRecord(id, "audio", baos.toByteArray, "audio/wav", "synthetic")
        }
      }
  }

  /** Deterministic synthetic animated-GIF corpus — the video analogue
    * of [[syntheticImages]]: each document renders to a short
    * multi-frame grayscale GIF (frame count from the text length,
    * dimensions from the id, pixels from an (id, frame)-seeded LCG),
    * encoded with ImageIO's sequence writer on the executors, so the
    * video decode leg exercises a genuine multi-frame container with
    * known ground-truth width/height/frameCount.
    */
  def syntheticVideo(spark: SparkSession, docs: DataFrame,
                     idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), length(col(textCol)).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, textLen) =>
          val w = 8 + (id % 9).toInt
          val h = 8 + (textLen % 11)
          val nFrames = 2 + (textLen % 6)
          val baos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            // grayscale frames: a GIF palette holds ≤256 colors, and 256
            // grays fit exactly — no quantizer in the loop
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var seed = (id * 31 + f) * 6364136223846793005L + 1442695040888963407L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                seed = seed * 6364136223846793005L + 1442695040888963407L
                raster.setSample(x, y, 0, ((seed >>> 32) & 0xFF).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          MediaRecord(id, "video", baos.toByteArray, "image/gif", "synthetic")
        }
      }
  }

  // ---- MP4 fixture corpus ----------------------------------------------

  /** One ISO BMFF box: 32-bit size + fourcc + concatenated children. */
  private def mp4Box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.map(_.length).sum)
    bb.putInt(bb.capacity)
    bb.put(typ.getBytes("ISO-8859-1"))
    body.foreach(bb.put)
    bb.array()
  }

  private def mp4U32(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  /** A minimal-but-well-formed MP4 whose metadata atoms carry the
    * given ground truth: mvhd timescale 1000 / duration = durationMs,
    * tkhd 16.16 dimensions, stsd fourcc `avc1`, stsz sample count.
    * The mdat payload is an id-seeded LCG stream (no real frames —
    * there is no JVM codec to decode them anyway).
    */
  def buildMp4(w: Int, h: Int, nFrames: Int, durationMs: Long,
               seed: Long): Array[Byte] = {
    val ftyp = mp4Box("ftyp", "isomiso2".getBytes("ISO-8859-1"))
    val mvhd = mp4Box("mvhd", mp4U32(0, 0, 0, 1000, durationMs))
    val tkhd = mp4Box("tkhd",
      mp4U32(0, 0, 0, 1, 0, durationMs), // ver/flags..duration
      new Array[Byte](52),               // reserved/layer/volume/matrix
      mp4U32(w.toLong << 16, h.toLong << 16))
    val stsd = mp4Box("stsd", mp4U32(0, 1), mp4Box("avc1", new Array[Byte](8)))
    val stsz = mp4Box("stsz", mp4U32(0, 0, nFrames))
    val moov = mp4Box("moov", mvhd,
      mp4Box("trak", tkhd, mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stsd, stsz)))))
    val payload = new Array[Byte](64)
    var s = seed
    var i = 0
    while (i < payload.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      payload(i) = (s >>> 56).toByte
      i += 1
    }
    ftyp ++ moov ++ mp4Box("mdat", payload)
  }

  // ---- Perceptual image dedup ------------------------------------------

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint: block-average luminance onto a 9×8 grid, one bit per
    * horizontally-adjacent cell comparison. Invariant under constant
    * brightness shifts (comparisons are relative), re-encoding, and
    * resolution changes that preserve the luminance field; near-dups
    * land within a few bits of Hamming distance. None on undecodable
    * bytes.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val (gw, gh) = (9, 8)
        val (w, h) = (img.getWidth, img.getHeight)
        val lum = Array.ofDim[Double](gh, gw)
        var gy = 0
        while (gy < gh) {
          var gx = 0
          while (gx < gw) {
            val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
            val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
            var s = 0.0; var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                s += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                n += 1; x += 1
              }
              y += 1
            }
            lum(gy)(gx) = s / n
            gx += 1
          }
          gy += 1
        }
        var sig = 0L
        var bit = 0
        gy = 0
        while (gy < gh) {
          var gx = 0
          while (gx < gw - 1) {
            if (lum(gy)(gx) > lum(gy)(gx + 1)) sig |= (1L << bit)
            bit += 1; gx += 1
          }
          gy += 1
        }
        Some(sig)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (doc_id, sig) perceptual fingerprints for every decodable image —
    * one decoder init per partition, blobs never shuffle (the hash is
    * 8 bytes; everything downstream rides it).
    */
  def imageHashes(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap(r => dHash64(r.content).map(sig => (r.media_id, sig)))
    }.toDF("doc_id", "sig")
  }

  /** Perceptual near-duplicate image pairs: [[dHash64]] fingerprints
    * through [[Dedup.hammingPairs64]]'s band-LSH — the image leg of
    * the dedup family. At 100 TB the only blob-sized pass is the
    * per-partition hash; pairing shuffles 8-byte signatures keyed on
    * band values, exactly like text SimHash.
    */
  def imageDupPairs(spark: SparkSession, media: Dataset[MediaRecord],
                    maxHamming: Int = 6, bands: Int = 8): DataFrame =
    Dedup.hammingPairs64(imageHashes(spark, media), maxHamming, bands)

  /** [[syntheticImages]] with the SAME id-seeded pixel noise but a
    * constant brightness lift and offset ids — planted perceptual
    * near-duplicates (dHash is brightness-invariant up to clamping at
    * 255, so each pair lands within a few Hamming bits of its source).
    */
  def syntheticNearDupImages(spark: SparkSession, docs: DataFrame,
                             idCol: String, textCol: String,
                             idOffset: Long, brightness: Int = 8): Dataset[MediaRecord] = {
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
              val rgb = ((seed >>> 24) & 0xFFFFFF).toInt
              def lift(c: Int) = math.min(255, c + brightness)
              img.setRGB(x, y, (lift((rgb >> 16) & 0xFF) << 16) |
                (lift((rgb >> 8) & 0xFF) << 8) | lift(rgb & 0xFF))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaRecord(id + idOffset, "image", baos.toByteArray, "image/png", "synthetic")
        }
      }
  }

  // ---- WebM fixture corpus ---------------------------------------------

  /** One EBML element: id bytes (marker kept) + 1-byte size + body.
    * Bodies must stay under 127 bytes — ample for header fixtures.
    */
  private def ebmlEl(id: Seq[Int], body: Array[Byte]*): Array[Byte] = {
    val len = body.map(_.length).sum
    require(len < 127, s"1-byte EBML size overflow: $len")
    id.map(_.toByte).toArray ++ Array((0x80 | len).toByte) ++ body.flatten
  }

  /** A minimal-but-well-formed WebM whose header elements carry the
    * given ground truth: TimecodeScale 1e6 ns (1 ms ticks), Duration
    * float32 = durationMs, Video PixelWidth/PixelHeight, CodecID
    * V_VP9. A Cluster with an id-seeded payload stands in for frame
    * data (no JVM codec decodes it anyway) and varies the content
    * fingerprint per record.
    */
  def buildWebm(w: Int, h: Int, durationMs: Long, seed: Long): Array[Byte] = {
    def u16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val header = ebmlEl(Seq(0x1A, 0x45, 0xDF, 0xA3))
    val info = ebmlEl(Seq(0x15, 0x49, 0xA9, 0x66),
      ebmlEl(Seq(0x2A, 0xD7, 0xB1), Array(0x0F, 0x42, 0x40).map(_.toByte)),
      ebmlEl(Seq(0x44, 0x89),
        java.nio.ByteBuffer.allocate(4).putFloat(durationMs.toFloat).array()))
    val video = ebmlEl(Seq(0xE0),
      ebmlEl(Seq(0xB0), u16(w)), ebmlEl(Seq(0xBA), u16(h)))
    val tracks = ebmlEl(Seq(0x16, 0x54, 0xAE, 0x6B),
      ebmlEl(Seq(0xAE), ebmlEl(Seq(0x86), "V_VP9".getBytes("ISO-8859-1")), video))
    val payload = new Array[Byte](48)
    var s = seed
    var i = 0
    while (i < payload.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      payload(i) = (s >>> 56).toByte
      i += 1
    }
    val cluster = ebmlEl(Seq(0x1F, 0x43, 0xB6, 0x75), payload)
    header ++ ebmlEl(Seq(0x18, 0x53, 0x80, 0x67), info, tracks, cluster)
  }

  /** Deterministic synthetic WebM corpus — the EBML leg of the
    * container-metadata family, ground-truthed like [[syntheticMp4]].
    * WebM headers carry no sample count (frames live per-cluster), so
    * these rows pin `channels == 0` — itself part of the contract.
    */
  def syntheticWebm(spark: SparkSession, docs: DataFrame,
                    idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), length(col(textCol)).cast("int"))
      .as[(Long, Int)]
      .map { case (id, textLen) =>
        val w = 32 * (1 + (id % 3).toInt)
        val h = 16 * (1 + (textLen % 4))
        MediaRecord(id, "video",
          buildWebm(w, h, durationMs = 500L + (textLen % 7) * 100L, seed = id),
          "video/webm", "synthetic")
      }
  }

  /** Deterministic synthetic MP4 corpus — the container-metadata leg
    * of the video family ([[MediaContainers]]): dimensions, duration
    * and sample count derive from id/text length, so the metadata
    * parse has generator ground truth the way [[syntheticVideo]]'s
    * GIF decode does.
    */
  def syntheticMp4(spark: SparkSession, docs: DataFrame,
                   idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), length(col(textCol)).cast("int"))
      .as[(Long, Int)]
      .map { case (id, textLen) =>
        val w = 16 * (1 + (id % 4).toInt)
        val h = 16 * (1 + (textLen % 3))
        val nFrames = 8 + (textLen % 24)
        MediaRecord(id, "video",
          buildMp4(w, h, nFrames, durationMs = 40L * nFrames, seed = id),
          "video/mp4", "synthetic")
      }
  }
}
