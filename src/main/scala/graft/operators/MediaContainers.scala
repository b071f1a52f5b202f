package graft.operators

/** Pure-JVM container-METADATA parsing for the video formats that
  * dominate real multimodal corpora but have no JDK codec: MP4 (ISO
  * BMFF box walk — `moov/mvhd` for timescale+duration, `trak/tkhd`
  * for track dimensions, `stbl/stsd` for the codec fourcc,
  * `stbl/stsz` for the sample count) and WebM (EBML walk —
  * `Info/TimecodeScale+Duration`, `Tracks/TrackEntry/Video/
  * PixelWidth+PixelHeight`, `CodecID`). Frame DECODE for these
  * containers stays honestly out of scope (no codec in the JVM);
  * metadata alone makes dimension/duration profiling, aspect-ratio
  * filtering and corpus stats real on real data.
  *
  * Everything is bounds-checked: truncated or corrupt atoms yield
  * None, never an exception — the per-partition decode loop treats
  * that exactly like an undecodable blob (stub fingerprint path).
  */
object MediaContainers {

  final case class VideoMeta(
      width: Int,
      height: Int,
      /** container-declared duration, milliseconds (0 when absent) */
      durationMs: Long,
      /** MP4: stsd fourcc (e.g. "avc1"); WebM: CodecID (e.g. "V_VP9") */
      codec: String,
      /** MP4: stsz sample count of the sized track; WebM: 0 (frame
        * counts live per-cluster, not in the headers) */
      nSamples: Int)

  /** Dispatch on magic: ISO BMFF `ftyp` at offset 4, EBML 0x1A45DFA3
    * at offset 0.
    */
  def parseVideoMeta(bytes: Array[Byte]): Option[VideoMeta] =
    if (bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') parseMp4(bytes)
    else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x1A &&
        (bytes(1) & 0xFF) == 0x45 && (bytes(2) & 0xFF) == 0xDF &&
        (bytes(3) & 0xFF) == 0xA3) parseWebm(bytes)
    else None

  // ---- MP4 / ISO BMFF ---------------------------------------------------

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  private val Mp4Containers =
    Set("moov", "trak", "mdia", "minf", "stbl")

  /** Walk the box tree; fold the atoms we need into one VideoMeta.
    * The first track with a nonzero tkhd width is "the" video track:
    * its dimensions, its stsd fourcc, its stsz sample count win.
    */
  def parseMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var codec = ""
    var nSamples = 0
    // per-trak scratch: tkhd dims seen in the CURRENT trak, so stsd/
    // stsz from a non-video track (audio width 0) never win
    var trakW = 0
    var trakH = 0

    def walk(start: Int, end: Int, inTrak: Boolean): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val size0 = be32(bytes, off)
        val typ = fourcc(bytes, off + 4)
        var header = 8
        val size =
          if (size0 == 1) {
            if (off + 16 > end) return false
            header = 16; be64(bytes, off + 8)
          } else if (size0 == 0) (end - off).toLong
          else size0
        if (size < header || off + size > end) return false
        val body = off + header
        val bodyEnd = (off + size).toInt
        typ match {
          case t if Mp4Containers(t) =>
            if (t == "trak") { trakW = 0; trakH = 0 }
            if (!walk(body, bodyEnd, inTrak || t == "trak")) return false
          case "mvhd" =>
            if (body + 4 > bodyEnd) return false
            val v = bytes(body) & 0xFF
            if (v == 1) {
              if (body + 28 > bodyEnd) return false
              timescale = be32(bytes, body + 20)
              duration = be64(bytes, body + 24)
            } else {
              if (body + 20 > bodyEnd) return false
              timescale = be32(bytes, body + 12)
              duration = be32(bytes, body + 16)
            }
          case "tkhd" =>
            if (body + 4 > bodyEnd) return false
            val v = bytes(body) & 0xFF
            // width/height: last 8 bytes of the box, 16.16 fixed point
            val dimOff = body + (if (v == 1) 88 else 76)
            if (dimOff + 8 > bodyEnd) return false
            val w = (be32(bytes, dimOff) >> 16).toInt
            val h = (be32(bytes, dimOff + 4) >> 16).toInt
            trakW = w; trakH = h
            if (w > 0 && width == 0) { width = w; height = h }
          case "stsd" =>
            if (body + 16 > bodyEnd) return false
            // ver/flags(4) entry_count(4) [entry: size(4) fourcc(4)]
            if (trakW > 0 && codec.isEmpty) codec = fourcc(bytes, body + 12)
          case "stsz" =>
            if (body + 12 > bodyEnd) return false
            if (trakW > 0 && nSamples == 0)
              nSamples = be32(bytes, body + 8).toInt
          case _ => () // mdat, free, ftyp, udta... skip
        }
        off = bodyEnd
      }
      true
    }

    if (!walk(0, bytes.length, inTrak = false)) None
    else if (width <= 0) None
    else {
      val ms = if (timescale > 0) duration * 1000L / timescale else 0L
      Some(VideoMeta(width, height, ms, codec, nSamples))
    }
  }

  // ---- WebM / EBML ------------------------------------------------------

  /** EBML varint: leading zero bits of the first byte give the length.
    * Returns (value, bytesConsumed) or null on truncation. `keepMarker`
    * keeps the length-marker bit (element IDs are matched WITH it).
    */
  private def vint(b: Array[Byte], o: Int, end: Int,
                   keepMarker: Boolean): (Long, Int) = {
    if (o >= end) return null
    val first = b(o) & 0xFF
    if (first == 0) return null
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (o + len > end) return null
    var v = (if (keepMarker) first else first & (0xFF >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xFFL); i += 1 }
    (v, len)
  }

  private val EbmlContainers: Set[Long] =
    Set(0x18538067L, 0x1549A966L, 0x1654AE6BL, 0xAEL, 0xE0L)
  //    Segment      Info         Tracks       TrackEntry Video

  def parseWebm(bytes: Array[Byte]): Option[VideoMeta] = {
    var timecodeScaleNs = 1000000L // EBML default: 1 ms
    var durationTicks = 0.0
    var width = 0
    var height = 0
    var codec = ""

    def readFloat(o: Int, n: Int): Double =
      if (n == 4) java.lang.Float.intBitsToFloat(be32(bytes, o).toInt).toDouble
      else if (n == 8) java.lang.Double.longBitsToDouble(be64(bytes, o))
      else 0.0

    def readUint(o: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (bytes(o + i) & 0xFFL); i += 1 }
      v
    }

    def walk(start: Int, end: Int): Boolean = {
      var off = start
      while (off < end) {
        val id = vint(bytes, off, end, keepMarker = true)
        if (id == null) return false
        val sz = vint(bytes, off + id._2, end, keepMarker = false)
        if (sz == null) return false
        val body = off + id._2 + sz._2
        // unknown-size element (all size bits set): extends to parent end
        val allOnes = sz._1 == (1L << (7 * sz._2)) - 1
        // reject 64-bit sizes exceeding the parent BEFORE the Int
        // narrowing: a corrupt size whose low 32 bits are small would
        // otherwise wrap into range and pass the bodyEnd checks
        if (!allOnes && sz._1 > (end - body).toLong) return false
        val bodyEnd = if (allOnes) end else body + sz._1.toInt
        if (bodyEnd > end || bodyEnd < body) return false
        id._1 match {
          case cid if EbmlContainers(cid) =>
            if (!walk(body, bodyEnd)) return false
          case 0x2AD7B1L => timecodeScaleNs = readUint(body, bodyEnd - body)
          case 0x4489L   => durationTicks = readFloat(body, bodyEnd - body)
          case 0xB0L     => if (width == 0) width = readUint(body, bodyEnd - body).toInt
          case 0xBAL     => if (height == 0) height = readUint(body, bodyEnd - body).toInt
          case 0x86L     => if (codec.isEmpty)
            codec = new String(bytes, body, bodyEnd - body, "ISO-8859-1")
          case _ => () // EBML header, Cluster payloads, ...
        }
        off = bodyEnd
      }
      true
    }

    if (!walk(0, bytes.length)) None
    else if (width <= 0) None
    else {
      val ms = (durationTicks * timecodeScaleNs / 1e6).toLong
      Some(VideoMeta(width, height, ms, codec, nSamples = 0))
    }
  }
}
