package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY §2 #30).
  *
  * Media travels as an opaque `binary` payload column plus a typed
  * metadata struct; decode / feature-extraction runs as a typed
  * `mapPartitions` over the payload bytes — the Spark-side plumbing
  * (schema, per-partition batching, JVM-side byte access) is exactly
  * what a native decoder (or a Pandas-UDF analogue) would see.
  *
  * Image DECODE IS REAL: [[decodeImageHeader]] parses PNG IHDR and JPEG
  * SOF headers byte-by-byte from the public format specifications (PNG:
  * ISO/IEC 15948 — 8-byte signature, IHDR must be the first chunk, with
  * big-endian width/height as its first two fields; JPEG: ITU-T T.81
  * Annex B — a marker scan over length-prefixed segments to the first
  * SOFn frame header, whose payload carries big-endian height then
  * width). No third-party codec library involved. Only the VIDEO side
  * ([[sampleFrames]] / [[resize]]) remains a documented stand-in — this
  * container ships no video codecs; the fan-out/partition shape there is
  * the production one.
  */
object Multimodal {

  /** Decoded image header fields; `format` is "png" / "jpeg" / "unknown"
    * (dims null when the payload doesn't parse). */
  case class ImageMeta(
      doc_id: Long,
      format: String,
      width: Option[Long],
      height: Option[Long],
      n_bytes: Long)

  /** Attach the opaque payload + metadata struct to a text corpus (the
    * testdata has no real media column, so documents stand in as payloads). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("txt").as("format"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** PNG signature (ISO/IEC 15948 §5.2): \x89 P N G \r \n \x1a \n. */
  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Parse an image header: Some(format, width, height) for a payload
    * whose leading bytes are a well-formed PNG or JPEG stream, None
    * otherwise. Reads ONLY the header region — O(header) per payload
    * regardless of image size, the right cost for a 100 TB metadata
    * scan.
    *
    *  - PNG: after the 8-byte signature the first chunk must be IHDR
    *    (§11.2.2); its 13-byte payload starts with big-endian
    *    width, height (4 bytes each, at stream offsets 16 and 20).
    *  - JPEG: segments are (0xFF, marker, 2-byte big-endian length)
    *    after the SOI marker (T.81 §B.1.1.4); standalone markers
    *    (RSTn/TEM) carry no length. The first SOFn (0xC0–0xCF minus
    *    DHT 0xC4, JPG 0xC8, DAC 0xCC) payload is: precision (1),
    *    height (2), width (2) — height FIRST (§B.2.2). */
  def decodeImageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes.length >= 24 && PngSig.indices.forall(i => (bytes(i) & 0xff) == PngSig(i))
        && bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val w = be32(bytes, 16); val h = be32(bytes, 20)
      // Spec bounds: dims are 31-bit positive (§11.2.2); 0 is invalid.
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(("png", w.toInt, h.toInt)) else None
    } else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      // GIF (CompuServe GIF89a spec §17-18): 6-byte version signature,
      // then the logical screen descriptor with LITTLE-endian u16
      // width and height at offsets 6 and 8.
      val w = le16(bytes, 6); val h = le16(bytes, 8)
      if (w > 0 && h > 0) Some(("gif", w, h)) else None
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // desynced: not a marker
        var j = i
        while (j < bytes.length && (bytes(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= bytes.length) return None
        val marker = bytes(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn payload: [len][precision][height][width]...
          if (j + 7 >= bytes.length) return None
          val h = be16(bytes, j + 4); val w = be16(bytes, j + 6)
          return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1 // standalone marker: no length field
        } else if (marker == 0xd9) {
          return None // EOI before any frame header
        } else {
          if (j + 2 >= bytes.length) return None
          val len = be16(bytes, j + 1)
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    } else None
  }

  /** Per-partition image-header decode over (id, payload) rows: the real
    * parser applied distributively, undecodable payloads surfaced as
    * format "unknown" with null dims (never an exception — a corrupt
    * blob in a 100 TB corpus must not kill the job). */
  def extractImageMeta(withPayloadDf: DataFrame): Dataset[ImageMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeImageHeader(bytes) match {
            case Some((fmt, w, h)) =>
              ImageMeta(id, fmt, Some(w.toLong), Some(h.toLong), bytes.length.toLong)
            case None => ImageMeta(id, "unknown", None, None, bytes.length.toLong)
          }
        }
      }
  }

  /** A minimal spec-conformant PNG stream: signature, IHDR (8-bit
    * truecolour, real CRC-32s via java.util.zip), IEND. 45 bytes. */
  private[ops] def pngBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val out = new java.io.ByteArrayOutputStream(45)
    PngSig.foreach(out.write)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue
      out.write((c >>> 24).toInt); out.write((c >>> 16).toInt)
      out.write((c >>> 8).toInt); out.write(c.toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A minimal spec-conformant JPEG stream: SOI, APP0/JFIF, SOF0
    * (baseline, one component), EOI — enough segments that the decode
    * scan must really walk length-prefixed markers. 35 bytes. */
  private[ops] def jpegBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val b = Array.newBuilder[Byte]
    def u8(v: Int): Unit = b += v.toByte
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v & 0xff) }
    u16(0xffd8) // SOI
    u16(0xffe0); u16(16) // APP0, length
    "JFIF".foreach(c => u8(c)); u8(0) // identifier
    u8(1); u8(1) // version 1.1
    u8(0); u16(1); u16(1) // aspect-ratio units, x/y density
    u8(0); u8(0) // no thumbnail
    u16(0xffc0); u16(11) // SOF0, length = 8 + 3·1
    u8(8); u16(h); u16(w) // precision, height FIRST, width
    u8(1); u8(1); u8(0x11); u8(0) // 1 component: id, 1x1 sampling, qtable
    u16(0xffd9) // EOI
    b.result()
  }

  /** A real GIF stream from the JDK's own ImageIO GIF encoder — unlike
    * [[pngBytes]]/[[jpegBytes]] the bytes here are an INDEPENDENT
    * encoder's output, so the header walk is exercised against foreign
    * framing (color tables, extension blocks) our code never wrote. */
  private[ops] def gifBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    out.toByteArray
  }

  /** Deterministic GIF corpus over an id column (dims arithmetic in the
    * id; bytes from the JDK encoder, parsed back per partition). */
  def syntheticGifs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          (id, gifBytes((id % 64L).toInt + 1, (id % 48L).toInt + 1))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Deterministic image corpus over an id column: even ids carry a PNG,
    * odd ids a JPEG, dims arithmetic in the id — so the decoded fields
    * are independently SQL-derivable while the bytes themselves are
    * real format-conformant streams built and parsed per partition. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          val w = (id % 512L).toInt + 1
          val h = (id % 384L).toInt + 1
          (id, if (id % 2L == 0L) pngBytes(w, h) else jpegBytes(w, h))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded audio header fields (nulls when the payload doesn't
    * parse); `duration_us` is integral µs — frames·10⁶ div rate. */
  case class AudioMeta(
      doc_id: Long,
      format: String,
      sample_rate: Option[Long],
      n_channels: Option[Long],
      bits_per_sample: Option[Long],
      n_frames: Option[Long],
      duration_us: Option[Long],
      n_bytes: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a WAV (RIFF/WAVE) header from the public container spec
    * (Microsoft/IBM Multimedia Programming Interface, RIFF 1991): the
    * 12-byte RIFF/WAVE preamble, then little-endian length-prefixed
    * chunks walked to the `fmt ` chunk (PCM layout: audio format u16,
    * channels u16, sample rate u32, byte rate u32, block align u16,
    * bits per sample u16) and the `data` chunk, whose byte length over
    * the block align gives the frame count. Reads only chunk headers —
    * O(header) per payload like the image path. */
  def decodeWavHeader(bytes: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    def tag(i: Int, s: String): Boolean =
      i + s.length <= bytes.length &&
        s.indices.forall(k => (bytes(i + k) & 0xff) == s.charAt(k))
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Long, Int, Int, Int)] = None // rate, channels, bits, align
    var dataLen: Option[Long] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val size = le32(bytes, i + 4)
      if (tag(i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > bytes.length) return None
        val channels = le16(bytes, i + 10)
        val rate = le32(bytes, i + 12)
        val align = le16(bytes, i + 20)
        val bits = le16(bytes, i + 22)
        if (channels < 1 || rate < 1 || align < 1 || bits < 1) return None
        fmt = Some((rate, channels, bits, align))
      } else if (tag(i, "data")) {
        dataLen = Some(size)
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((rate, ch, bits, align) <- fmt; dl <- dataLen)
      yield (rate, ch, bits, dl / align)
  }

  /** Per-partition WAV-header decode over (id, payload) rows — same
    * contract as [[extractImageMeta]]: corrupt payloads surface as
    * "unknown" with nulls, never an exception. */
  def extractAudioMeta(withPayloadDf: DataFrame): Dataset[AudioMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeWavHeader(bytes) match {
            case Some((rate, ch, bits, frames)) =>
              AudioMeta(id, "wav", Some(rate), Some(ch.toLong),
                Some(bits.toLong), Some(frames),
                Some(frames * 1000000L / rate), bytes.length.toLong)
            case None =>
              AudioMeta(id, "unknown", None, None, None, None, None,
                bytes.length.toLong)
          }
        }
      }
  }

  /** A minimal spec-conformant PCM WAV stream: RIFF/WAVE preamble,
    * 16-byte `fmt ` chunk, `data` chunk of silent frames. 44 + data
    * bytes. */
  private[ops] def wavBytes(
      rate: Int, channels: Int, bits: Int, frames: Int): Array[Byte] = {
    require(rate > 0 && channels > 0 && bits % 8 == 0 && frames >= 0)
    val align = channels * bits / 8
    val dataLen = frames * align
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    ascii("RIFF"); u32(36L + dataLen); ascii("WAVE")
    ascii("fmt "); u32(16L)
    u16(1) // PCM
    u16(channels); u32(rate.toLong)
    u32(rate.toLong * align) // byte rate
    u16(align); u16(bits)
    ascii("data"); u32(dataLen.toLong)
    (0 until dataLen).foreach(_ => out.write(0))
    out.toByteArray
  }

  /** Deterministic audio corpus over an id column — the WAV sibling of
    * [[syntheticImages]]: every parameter is id-arithmetic so decoded
    * fields are SQL-derivable while the bytes are real RIFF streams. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100)
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          val rate = rates((id % 4L).toInt)
          val channels = (id % 2L).toInt + 1
          val bits = if (id % 3L == 0L) 8 else 16
          val frames = (id % 100L).toInt + 1
          (id, wavBytes(rate, channels, bits, frames))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decoded video-container fields (nulls when the payload doesn't
    * parse). Dims come from the track headers' 16.16 fixed-point
    * geometry; duration is integral µs over the movie timescale. */
  case class VideoMeta(
      doc_id: Long,
      format: String,
      duration_us: Option[Long],
      width: Option[Long],
      height: Option[Long],
      n_tracks: Option[Long],
      n_bytes: Long)

  /** Parse an ISO-BMFF (MP4) container header from the public spec
    * (ISO/IEC 14496-12): big-endian length-prefixed boxes — `ftyp`
    * first, then a walk to `moov`, whose `mvhd` carries the movie
    * timescale and duration and whose `trak`→`tkhd` children carry
    * per-track 16.16 fixed-point width/height (audio tracks: zero).
    * Returns (timescale, duration ticks, max width, max height,
    * track count). Box sizes are trusted per-box exactly like the
    * RIFF walk; unknown boxes are skipped, truncated ones reject. */
  def decodeMp4Header(bytes: Array[Byte]): Option[(Long, Long, Int, Int, Int)] = {
    def boxType(i: Int, s: String): Boolean =
      i + 8 <= bytes.length && s.indices.forall(k => (bytes(i + 4 + k) & 0xff) == s.charAt(k))
    if (bytes.length < 24 || !boxType(0, "ftyp")) return None
    var i = 0
    var mvhd: Option[(Long, Long)] = None
    var w = 0; var h = 0; var tracks = 0
    while (i + 8 <= bytes.length) {
      val size = be32(bytes, i)
      if (size < 8 || i + size > bytes.length) return None
      if (boxType(i, "moov")) {
        // walk moov children
        var j = i + 8
        val end = i + size.toInt
        while (j + 8 <= end) {
          val csize = be32(bytes, j)
          if (csize < 8 || j + csize > end) return None
          if (boxType(j, "mvhd")) {
            val v = bytes(j + 8) & 0xff
            // v0: ver/flags(4) + times(4+4) + timescale(4) + duration(4)
            // v1: ver/flags(4) + times(8+8) + timescale(4) + duration(8)
            if (v == 0 && j + 28 <= end)
              mvhd = Some((be32(bytes, j + 20), be32(bytes, j + 24)))
            else if (v == 1 && j + 40 <= end)
              mvhd = Some((be32(bytes, j + 28),
                (be32(bytes, j + 32) << 32) | be32(bytes, j + 36)))
            else return None
          } else if (boxType(j, "trak")) {
            tracks += 1
            // walk trak children for tkhd
            var k = j + 8
            val tend = j + csize.toInt
            while (k + 8 <= tend) {
              val tsize = be32(bytes, k)
              if (tsize < 8 || k + tsize > tend) return None
              if (boxType(k, "tkhd")) {
                // width/height: the LAST 8 bytes of the box, 16.16 fixed
                val wOff = k + tsize.toInt - 8
                if (wOff >= k + 8) {
                  w = math.max(w, (be32(bytes, wOff) >> 16).toInt)
                  h = math.max(h, (be32(bytes, wOff + 4) >> 16).toInt)
                }
              }
              k += tsize.toInt
            }
          }
          j += csize.toInt
        }
      }
      i += size.toInt
    }
    for ((ts, dur) <- mvhd if ts > 0 && tracks > 0)
      yield (ts, dur, w, h, tracks)
  }

  /** Per-partition MP4 header decode — same contract as the image and
    * audio paths: corrupt payloads surface as "unknown" with nulls. */
  def extractVideoMeta(withPayloadDf: DataFrame): Dataset[VideoMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeMp4Header(bytes) match {
            case Some((ts, dur, w, h, n)) =>
              VideoMeta(id, "mp4", Some(dur * 1000000L / ts),
                Some(w.toLong), Some(h.toLong), Some(n.toLong),
                bytes.length.toLong)
            case None =>
              VideoMeta(id, "unknown", None, None, None, None,
                bytes.length.toLong)
          }
        }
      }
  }

  /** A minimal spec-conformant MP4: `ftyp` (isom), `moov` with a v0
    * `mvhd` and `n` tracks whose v0 `tkhd` boxes give the FIRST track
    * the video geometry and the rest zero dims (the audio-track
    * shape). 140 + 100·n bytes. */
  private[ops] def mp4Bytes(
      timescale: Long, duration: Long, w: Int, h: Int, nTracks: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && w > 0 && h > 0 && nTracks >= 1)
    val out = new java.io.ByteArrayOutputStream(140 + 100 * nTracks)
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def ascii(s: String): Unit = s.foreach(c => out.write(c))
    // ftyp: major brand isom, minor version, two compatible brands
    u32(24); ascii("ftyp"); ascii("isom"); u32(0); ascii("isom"); ascii("mp41")
    val mvhdSize = 108; val tkhdSize = 92
    u32(8L + mvhdSize + nTracks * (8L + tkhdSize)); ascii("moov")
    u32(mvhdSize); ascii("mvhd")
    u32(0) // version 0 + flags
    u32(0); u32(0) // creation, modification
    u32(timescale); u32(duration)
    u32(0x00010000L); u32(0x01000000L) // rate 1.0, volume 1.0 + reserved
    u32(0); u32(0) // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(u32) // unity matrix
    (0 until 6).foreach(_ => u32(0)) // pre_defined
    u32(nTracks + 1L) // next_track_ID
    (0 until nTracks).foreach { t =>
      u32(8L + tkhdSize); ascii("trak")
      u32(tkhdSize); ascii("tkhd")
      u32(0x00000007L) // version 0, flags: enabled+in-movie+in-preview
      u32(0); u32(0) // creation, modification
      u32(t + 1L); u32(0) // track id, reserved
      u32(duration)
      u32(0); u32(0) // reserved
      u32(0); u32(0) // layer+altgroup, volume+reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(u32)
      if (t == 0) { u32(w.toLong << 16); u32(h.toLong << 16) }
      else { u32(0); u32(0) }
    }
    out.toByteArray
  }

  /** Deterministic video corpus over an id column — every container
    * parameter id-arithmetic, bytes real ISO-BMFF box streams. */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scales = Array(600L, 1000L, 90000L)
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          val ts = scales((id % 3L).toInt)
          val dur = (id % 500L + 1L) * 100L
          val w = (id % 640L).toInt + 16
          val h = (id % 360L).toInt + 16
          val n = (id % 2L).toInt + 1
          (id, mp4Bytes(ts, dur, w, h, n))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** STUB frame sampler: `n` evenly-spaced byte windows standing in for
    * decoded video frames. The Spark shape is the production one — one
    * payload row fans out to (doc_id, frame_idx, frame: binary) rows from
    * a per-partition iterator, so a real decoder drops in by replacing
    * the slice with codec output. Frame count never exceeds the payload's
    * pseudo frame count (bytes % 30 + 1 — the video-codec stand-in). */
  def sampleFrames(withPayloadDf: DataFrame, n: Int): DataFrame = {
    require(n > 0)
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = math.min(n.toLong, bytes.length % 30L + 1L).toInt
          val len = math.max(bytes.length / math.max(frames, 1), 1)
          (0 until frames).map { f =>
            val from = math.min(f * len, math.max(bytes.length - 1, 0))
            val until = math.min(from + len, bytes.length)
            (id, f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** STUB resize: replace each payload with a deterministic `w`·`h`/64
    * byte digest-stream (a real implementation swaps the loop body for a
    * scaler); metadata struct is rewritten to the new geometry — the
    * schema-evolution half is the part Spark owns either way. */
  def resize(withPayloadDf: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0)
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    val outLen = math.max(w * h / 64, 1)
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](outLen)
          var state = id ^ 0x9E3779B97F4A7C15L
          var i = 0
          while (i < outLen) {
            val src = if (bytes.nonEmpty) bytes(((i.toLong * bytes.length) / outLen).toInt) else 0
            state = state * 6364136223846793005L + src
            out(i) = (state >>> 56).toByte
            i += 1
          }
          (id, out)
        }
      }
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(
        lit("resized").as("format"),
        lit(outLen.toLong).as("n_bytes"),
        lit(w.toLong).as("width"),
        lit(h.toLong).as("height")))
  }

  /** Decoded TIFF IFD0 fields: `byte_order` is "II" (little-endian) or
    * "MM" (big-endian); dims/orientation null when the tag is absent. */
  case class TiffMeta(
      doc_id: Long,
      byte_order: String,
      width: Option[Long],
      height: Option[Long],
      orientation: Option[Long],
      n_bytes: Long)

  /** Parse a TIFF header + IFD0 from the public TIFF 6.0 spec (Adobe
    * 1992, §2): 2-byte order mark ("II" little / "MM" big endian),
    * magic 42 in that order, u32 offset to IFD0; the IFD is a u16
    * entry count then 12-byte entries (tag u16, type u16, count u32,
    * value-or-offset u32). SHORT(3)/LONG(4) values with count 1 are
    * inlined LEFT-JUSTIFIED in the 4-byte value field (§2: "the value
    * is ... left-justified"), so a SHORT reads as the first two bytes
    * in the file's byte order. Extracts ImageWidth (256), ImageLength
    * (257), Orientation (274) — an O(entries) directory walk that
    * never touches strip data, unlike the fixed-offset PNG/GIF parses
    * this is the tag-directory shape EXIF and DNG share. */
  def decodeTiffMeta(bytes: Array[Byte]): Option[(String, Option[Long], Option[Long], Option[Long])] = {
    if (bytes.length < 8) return None
    val little =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return None
    def u16(i: Int): Int =
      if (i + 1 >= bytes.length) -1
      else if (little) le16(bytes, i) else be16(bytes, i)
    def u32(i: Int): Long =
      if (i + 3 >= bytes.length) -1L
      else if (little) le32(bytes, i) else be32(bytes, i)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd.toInt)
    if (n < 0) return None
    var width, height, orient: Option[Long] = None
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + e * 12
      if (off + 12 > bytes.length) return None
      val tag = u16(off)
      val tpe = u16(off + 2)
      val cnt = u32(off + 4)
      if (cnt == 1L) {
        // Inline value: SHORT left-justified 2 bytes, LONG all 4.
        val v: Long =
          if (tpe == 3) u16(off + 8).toLong
          else if (tpe == 4) u32(off + 8)
          else -1L
        if (v >= 0) tag match {
          case 256 => width = Some(v)
          case 257 => height = Some(v)
          case 274 => orient = Some(v)
          case _ =>
        }
      }
      e += 1
    }
    Some((if (little) "II" else "MM", width, height, orient))
  }

  /** A minimal spec-conformant TIFF: header + one IFD0 with
    * ImageWidth (LONG), ImageLength (LONG), Orientation (SHORT) in
    * ascending tag order (spec §2 requires sorted entries), in either
    * byte order. No strip data — a pure directory skeleton, which is
    * exactly what the O(header) parse may read. */
  private[ops] def tiffBytes(w: Int, h: Int, orientation: Int, little: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && orientation >= 1 && orientation <= 8)
    val out = new java.io.ByteArrayOutputStream(8 + 2 + 3 * 12 + 4)
    def u16(v: Int): Unit =
      if (little) { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      else { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Long): Unit =
      if (little) { out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt) }
      else { out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    out.write(if (little) 'I' else 'M'); out.write(if (little) 'I' else 'M')
    u16(42)
    u32(8L) // IFD0 immediately after the header
    u16(3)  // three entries
    // tag, type, count, value (LONG inline / SHORT left-justified)
    u16(256); u16(4); u32(1L); u32(w.toLong)
    u16(257); u16(4); u32(1L); u32(h.toLong)
    u16(274); u16(3); u32(1L); u16(orientation); u16(0)
    u32(0L) // no next IFD
    out.toByteArray
  }

  /** Deterministic TIFF corpus over an id column: dims/orientation are
    * id arithmetic, byte order alternates II/MM by id parity so both
    * endian walks are exercised on every run. */
  def syntheticTiffs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          val w = (id % 512L).toInt + 1
          val h = (id % 384L).toInt + 1
          val o = (id % 8L).toInt + 1
          (id, tiffBytes(w, h, o, little = id % 2L == 0L))
        }
      }
      .toDF("doc_id", "payload")
  }

  case class BmpMeta(
      doc_id: Long,
      format: String,
      width: Option[Long],
      height: Option[Long],
      bpp: Option[Long],
      top_down: Option[Boolean])

  /** Parse a BMP file header + BITMAPINFOHEADER (Windows BMP v3, the
    * layout every encoder emits): "BM" signature, u32 LE data offset
    * at 10; DIB header size u32 LE at 14 (≥ 40 for BITMAPINFOHEADER),
    * SIGNED i32 LE width/height at 18/22 — a negative height is the
    * spec's top-down flag — and u16 LE bits-per-pixel at 28. */
  def decodeBmpMeta(bytes: Array[Byte]): Option[(Long, Long, Long, Boolean)] = {
    if (bytes.length < 30 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val dibSize = le32(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not handled
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    if (w <= 0 || h == 0 || bpp <= 0) None
    else Some((w.toLong, math.abs(h.toLong), bpp.toLong, h < 0))
  }

  /** A real BMP byte stream from the JDK's own encoder (24-bit,
    * bottom-up) — the parse target is a foreign encoder's framing,
    * same independence discipline as the GIF/WAV fixtures. */
  private[ops] def bmpBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  /** Deterministic BMP corpus over an id column (dims arithmetic in
    * the id; bytes from the JDK encoder, parsed back per partition). */
  def syntheticBmps(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          (id, bmpBytes((id % 96L).toInt + 1, (id % 72L).toInt + 1))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-partition BMP decode over (id, payload) rows — same
    * corrupt-tolerant contract as [[extractImageMeta]]. */
  def extractBmpMeta(withPayloadDf: DataFrame): Dataset[BmpMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeBmpMeta(bytes) match {
            case Some((w, h, bpp, td)) =>
              BmpMeta(id, "bmp", Some(w), Some(h), Some(bpp), Some(td))
            case None => BmpMeta(id, "unknown", None, None, None, None)
          }
        }
      }
  }

  case class WbmpMeta(
      doc_id: Long,
      format: String,
      width: Option[Long],
      height: Option[Long],
      header_bytes: Option[Long],
      n_bytes: Long)

  /** Parse a WBMP (WAP-237 Wireless Bitmap) header: TypeField uintvar
    * (0 = level-0 B/W), FixHeaderField octet, then width and height as
    * multi-byte uintvars (7 data bits per octet, continuation bit 0x80
    * — the variable-length integer this format exists to exercise).
    * Returns (width, height, header length). O(header) per payload. */
  def decodeWbmpMeta(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    var i = 0
    def uintvar(): Option[Long] = {
      var v = 0L
      var n = 0
      while (i < bytes.length && (bytes(i) & 0x80) != 0) {
        v = (v << 7) | (bytes(i) & 0x7fL); i += 1; n += 1
        if (n > 5) return None
      }
      if (i >= bytes.length) return None
      v = (v << 7) | (bytes(i) & 0x7fL); i += 1
      Some(v)
    }
    for {
      typ <- uintvar() if typ == 0L && i < bytes.length
      _ = { i += 1 } // FixHeaderField (0 for level 0)
      w <- uintvar() if w > 0
      h <- uintvar() if h > 0
    } yield (w, h, i.toLong)
  }

  /** A real WBMP byte stream from the JDK's own encoder — the parse
    * target is a foreign encoder's framing, same independence
    * discipline as the GIF/BMP fixtures. */
  private[ops] def wbmpBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "wbmp", out)
    out.toByteArray
  }

  /** Deterministic WBMP corpus over an id column — dims reach past 127
    * so both one- and two-octet uintvars occur. */
  def syntheticWbmps(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          (id, wbmpBytes((id % 200L).toInt + 1, (id % 150L).toInt + 1))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-partition WBMP decode over (id, payload) rows — same
    * corrupt-tolerant contract as [[extractImageMeta]]. */
  def extractWbmpMeta(withPayloadDf: DataFrame): Dataset[WbmpMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeWbmpMeta(bytes) match {
            case Some((w, h, hdr)) =>
              WbmpMeta(id, "wbmp", Some(w), Some(h), Some(hdr),
                bytes.length.toLong)
            case None => WbmpMeta(id, "unknown", None, None, None,
              bytes.length.toLong)
          }
        }
      }
  }

  case class MidiMeta(
      doc_id: Long,
      format: String,
      midi_format: Option[Long],
      n_tracks: Option[Long],
      division: Option[Long],
      n_mtrk: Option[Long],
      n_bytes: Long)

  /** Parse a Standard MIDI File header (MMA SMF 1.0): big-endian
    * 'MThd' + u32 length-6 body holding format u16, track count u16,
    * and the PPQ division u16 (top bit clear = ticks per quarter),
    * then the 'MTrk' chunks WALKED by their u32 lengths so the
    * declared track count is verified against the actual chunk list.
    * O(header + chunk directory). */
  def decodeMidiMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def tag(i: Int, s: String): Boolean =
      i + s.length <= bytes.length &&
        s.indices.forall(k => (bytes(i + k) & 0xff) == s.charAt(k))
    if (bytes.length < 14 || !tag(0, "MThd") || be32(bytes, 4) != 6L) return None
    val fmt = be16(bytes, 8)
    val ntr = be16(bytes, 10)
    val div = be16(bytes, 12)
    if (div >= 0x8000) return None // SMPTE division not handled
    var i = 14
    var mtrk = 0L
    var walking = true
    while (walking && i + 8 <= bytes.length) {
      val size = be32(bytes, i + 4)
      // A declared length past the buffer end (including the ≥2^31 case
      // whose .toInt wraps negative and would stall the walk) ends the
      // walk with the partial count — corrupt-tolerant, never loops.
      if (size > bytes.length - i - 8) walking = false
      else {
        if (tag(i, "MTrk")) mtrk += 1
        i += 8 + size.toInt
      }
    }
    Some((fmt, ntr, div, mtrk))
  }

  /** A real SMF byte stream from the JDK's own MIDI writer (type-1
    * file, one NOTE_ON per track) — foreign-encoder discipline. */
  private[ops] def midiBytes(ppq: Int, nTracks: Int): Array[Byte] = {
    require(ppq > 0 && nTracks > 0)
    val seq = new javax.sound.midi.Sequence(javax.sound.midi.Sequence.PPQ, ppq)
    (0 until nTracks).foreach { t =>
      val tr = seq.createTrack()
      tr.add(new javax.sound.midi.MidiEvent(
        new javax.sound.midi.ShortMessage(
          javax.sound.midi.ShortMessage.NOTE_ON, 0, 60 + t, 93),
        10L * (t + 1)))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.midi.MidiSystem.write(seq, 1, out)
    out.toByteArray
  }

  /** Deterministic MIDI corpus — id-arithmetic PPQ/track parameters. */
  def syntheticMidis(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ppqs = Array(96, 192, 384, 480)
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          (id, midiBytes(ppqs((id % 4L).toInt), (id % 3L).toInt + 1))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-partition MIDI decode over (id, payload) rows — same
    * corrupt-tolerant contract as [[extractImageMeta]]. */
  def extractMidiMeta(withPayloadDf: DataFrame): Dataset[MidiMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeMidiMeta(bytes) match {
            case Some((fmt, ntr, div, mtrk)) =>
              MidiMeta(id, "midi", Some(fmt.toLong), Some(ntr.toLong),
                Some(div.toLong), Some(mtrk), bytes.length.toLong)
            case None =>
              MidiMeta(id, "unknown", None, None, None, None, bytes.length.toLong)
          }
        }
      }
  }

  case class AiffMeta(
      doc_id: Long,
      format: String,
      sample_rate: Option[Long],
      n_channels: Option[Long],
      bits_per_sample: Option[Long],
      n_frames: Option[Long],
      duration_us: Option[Long])

  /** Parse an AIFF (EA IFF 85 / Apple AIFF 1.3) header: big-endian
    * FORM/AIFF preamble, chunks walked to COMM — channels u16, frames
    * u32, sample size u16, and the sample rate as an 80-bit IEEE 754
    * EXTENDED float (15-bit exponent biased 16383, explicit-integer-
    * bit 64-bit mantissa): rate = mantissa · 2^(exp−16383−63), an
    * exact Long shift for every real audio rate. O(header). */
  def decodeAiffMeta(bytes: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    def tag(i: Int, s: String): Boolean =
      i + s.length <= bytes.length &&
        s.indices.forall(k => (bytes(i + k) & 0xff) == s.charAt(k))
    if (bytes.length < 12 || !tag(0, "FORM") || !tag(8, "AIFF")) return None
    var i = 12
    while (i + 8 <= bytes.length) {
      val size = be32(bytes, i + 4)
      // Corrupt declared length past the buffer end (incl. the ≥2^31
      // .toInt-wraps-negative case that would stall the walk): reject —
      // uniformly, COMM included, matching the MIDI walk's stop-and-
      // count semantics (a COMM whose declared size overruns the buffer
      // is as corrupt as any other chunk, even if 18 body bytes fit).
      if (size > bytes.length - i - 8) return None
      if (tag(i, "COMM")) {
        if (size < 18 || i + 8 + 18 > bytes.length) return None
        val channels = be16(bytes, i + 8)
        val frames = be32(bytes, i + 10)
        val bits = be16(bytes, i + 14)
        val exp = be16(bytes, i + 16) & 0x7fff
        val mant = (be32(bytes, i + 18) << 32) | be32(bytes, i + 22)
        val shift = exp - 16383 - 63
        val rate =
          if (shift >= 0) mant << shift
          else mant >>> -shift
        return if (channels < 1 || bits < 1 || rate < 1) None
        else Some((rate, channels, bits, frames))
      }
      i += 8 + size.toInt + (size.toInt & 1) // IFF chunks are word-aligned
    }
    None
  }

  /** A real AIFF byte stream from the JDK's own encoder
    * (javax.sound.sampled — a foreign implementation of the 80-bit
    * extended-float rate field this decoder exists to parse). */
  private[ops] def aiffBytes(
      rate: Int, channels: Int, bits: Int, frames: Int): Array[Byte] = {
    require(rate > 0 && channels > 0 && bits % 8 == 0 && frames >= 0)
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, bits, channels, true, true)
    val dataLen = frames * channels * bits / 8
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](dataLen)), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    out.toByteArray
  }

  /** Deterministic AIFF corpus — the big-endian sibling of
    * [[syntheticAudio]], same id-arithmetic parameters. */
  def syntheticAiffs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100)
    // Payload synthesis (a JDK encoder run per row) is CPU-bound narrow
    // work fused onto what is typically a single-split id scan — spread
    // it cluster-wide first (fanOut: no-op on a wide at-scale scan).
    graft.Tables.fanOut(df.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions {
        _.map { id =>
          val rate = rates((id % 4L).toInt)
          val channels = (id % 2L).toInt + 1
          val bits = if (id % 3L == 0L) 8 else 16
          val frames = (id % 100L).toInt + 1
          (id, aiffBytes(rate, channels, bits, frames))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-partition AIFF decode over (id, payload) rows — same
    * corrupt-tolerant contract as [[extractImageMeta]]. */
  def extractAiffMeta(withPayloadDf: DataFrame): Dataset[AiffMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeAiffMeta(bytes) match {
            case Some((rate, ch, bits, frames)) =>
              AiffMeta(id, "aiff", Some(rate), Some(ch.toLong),
                Some(bits.toLong), Some(frames),
                Some(frames * 1000000L / rate))
            case None =>
              AiffMeta(id, "unknown", None, None, None, None, None)
          }
        }
      }
  }

  /** Per-partition TIFF decode over (id, payload) rows — same
    * corrupt-tolerant contract as [[extractImageMeta]]. */
  def extractTiffMeta(withPayloadDf: DataFrame): Dataset[TiffMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions {
        _.map { case (id, bytes) =>
          decodeTiffMeta(bytes) match {
            case Some((bo, w, h, o)) => TiffMeta(id, bo, w, h, o, bytes.length.toLong)
            case None => TiffMeta(id, "unknown", None, None, None, bytes.length.toLong)
          }
        }
      }
  }
}
