package graft.ops

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The image-header decoder against genuinely-encoded files (JDK
  * ImageIO writers — full PNG/JPEG encoders, independent of our
  * byte-level generator), our own minimal streams, and malformed input.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def imageIoBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699) // non-trivial content
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
    out.toByteArray
  }

  test("decodeImageHeader reads real ImageIO-encoded PNG and JPEG files") {
    assert(Multimodal.decodeImageHeader(imageIoBytes("png", 37, 23))
      .contains(("png", 37, 23)))
    // The JDK JPEG writer emits APP0 + DQT + SOF + DHT + scan data —
    // the marker walk must skip several variable-length segments.
    assert(Multimodal.decodeImageHeader(imageIoBytes("jpg", 129, 300))
      .contains(("jpeg", 129, 300)))
  }

  test("decodeImageHeader reads GIF logical screen descriptors, rejects bad versions") {
    assert(Multimodal.decodeImageHeader(imageIoBytes("gif", 37, 23))
      .contains(("gif", 37, 23)))
    assert(Multimodal.decodeImageHeader(Multimodal.gifBytes(640, 1))
      .contains(("gif", 640, 1)))
    // An unknown version tag ("GIF90a") must not parse as GIF.
    val bad = Multimodal.gifBytes(5, 5)
    bad(4) = '0'.toByte
    assert(Multimodal.decodeImageHeader(bad).isEmpty)
  }

  test("decodeImageHeader round-trips the minimal generator streams") {
    assert(Multimodal.decodeImageHeader(Multimodal.pngBytes(512, 384))
      .contains(("png", 512, 384)))
    assert(Multimodal.decodeImageHeader(Multimodal.jpegBytes(1, 65535))
      .contains(("jpeg", 1, 65535)))
    assert(Multimodal.pngBytes(7, 9).length == 45)
    assert(Multimodal.jpegBytes(7, 9).length == 35)
    // ImageIO agrees our minimal PNG header is a readable PNG header.
    val rdr = ImageIO.getImageReaders(
      ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.pngBytes(40, 30))))
    assert(rdr.hasNext)
    val r = rdr.next()
    r.setInput(ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(Multimodal.pngBytes(40, 30))))
    assert(r.getWidth(0) == 40 && r.getHeight(0) == 30)
  }

  test("decodeImageHeader rejects malformed payloads instead of throwing") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "not an image at all".getBytes("UTF-8"),
      Multimodal.pngBytes(10, 10).take(20), // truncated mid-IHDR
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte), // SOI then EOI, no SOF
      Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte), // desynced marker stream
      Multimodal.jpegBytes(5, 5).take(6)) // truncated inside APP0
    cases.foreach(b => assert(Multimodal.decodeImageHeader(b).isEmpty))
    // PNG signature but a non-IHDR first chunk: rejected.
    val bad = Multimodal.pngBytes(10, 10)
    bad(12) = 'X'
    assert(Multimodal.decodeImageHeader(bad).isEmpty)
  }

  test("extractImageMeta decodes distributively and survives corrupt blobs") {
    val rows = Seq(
      (2L, Multimodal.pngBytes(3, 4)),
      (5L, Multimodal.jpegBytes(300, 200)),
      (7L, "garbage".getBytes("UTF-8")))
    val meta = Multimodal.extractImageMeta(rows.toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(2L).format == "png" && meta(2L).width.contains(3L) &&
      meta(2L).height.contains(4L) && meta(2L).n_bytes == 45L)
    assert(meta(5L).format == "jpeg" && meta(5L).width.contains(300L) &&
      meta(5L).height.contains(200L) && meta(5L).n_bytes == 35L)
    assert(meta(7L).format == "unknown" && meta(7L).width.isEmpty &&
      meta(7L).height.isEmpty && meta(7L).n_bytes == 7L)
  }

  test("syntheticImages corpus decodes to its id-derived geometry") {
    val ids = Seq(0L, 1L, 511L, 512L, 513L, 1000L)
    val meta = Multimodal.extractImageMeta(
        Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id"))
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      val m = meta(id)
      assert(m.format == (if (id % 2 == 0) "png" else "jpeg"))
      assert(m.width.contains(id % 512 + 1) && m.height.contains(id % 384 + 1))
    }
  }

  test("decodeWavHeader reads a real JDK AudioSystem-encoded WAV") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit stereo 22050 Hz, 37 frames of silence — encoded by the
    // JDK's own WAV writer, independent of our byte generator.
    val fmt = new AudioFormat(22050f, 16, 2, true, false)
    val pcm = new Array[Byte](37 * 4)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 37L)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(Multimodal.decodeWavHeader(out.toByteArray)
      .contains((22050L, 2, 16, 37L)))
  }

  test("decodeWavHeader walks chunks, round-trips, rejects malformed") {
    // generator round-trip
    assert(Multimodal.decodeWavHeader(Multimodal.wavBytes(8000, 1, 8, 100))
      .contains((8000L, 1, 8, 100L)))
    // an unknown chunk before fmt must be skipped, not fatal: splice a
    // "JUNK" chunk (odd size — exercises word alignment) after "WAVE"
    val base = Multimodal.wavBytes(44100, 2, 16, 5)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // RIFF size field is now stale, but chunk walking only trusts the
    // per-chunk lengths — exactly what a robust reader must do.
    assert(Multimodal.decodeWavHeader(spliced).contains((44100L, 2, 16, 5L)))
    // malformed payloads reject cleanly
    assert(Multimodal.decodeWavHeader(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWavHeader(
      "RIFFxxxxNOPE".getBytes("US-ASCII") ++ new Array[Byte](40)).isEmpty)
    assert(Multimodal.decodeWavHeader(
      Multimodal.pngBytes(3, 4)).isEmpty, "an image is not audio")
  }

  test("decodeMp4Header walks boxes, reads mvhd and fixed-point tkhd dims") {
    val b = Multimodal.mp4Bytes(600L, 100L, 16, 16, 1)
    assert(b.length == 240, s"generator size drifted: ${b.length}")
    assert(Multimodal.decodeMp4Header(b).contains((600L, 100L, 16, 16, 1)))
    // two tracks: geometry from the video track, count includes both
    assert(Multimodal.decodeMp4Header(Multimodal.mp4Bytes(90000L, 4500L, 640, 360, 2))
      .contains((90000L, 4500L, 640, 360, 2)))
    // malformed payloads reject cleanly
    assert(Multimodal.decodeMp4Header(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeMp4Header(Multimodal.wavBytes(8000, 1, 8, 1)).isEmpty)
  }

  test("syntheticAudio corpus decodes to its id-derived parameters") {
    val ids = Seq(0L, 1L, 2L, 3L, 6L, 99L, 100L)
    val rates = Array(8000L, 16000L, 22050L, 44100L)
    val meta = Multimodal.extractAudioMeta(
        Multimodal.syntheticAudio(ids.toDF("doc_id"), "doc_id"))
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      val m = meta(id)
      assert(m.format == "wav")
      assert(m.sample_rate.contains(rates((id % 4).toInt)))
      assert(m.n_channels.contains(id % 2 + 1))
      assert(m.bits_per_sample.contains(if (id % 3 == 0) 8L else 16L))
      assert(m.n_frames.contains(id % 100 + 1))
      val frames = id % 100 + 1
      assert(m.duration_us.contains(frames * 1000000L / rates((id % 4).toInt)))
    }
  }

  test("decodeTiffMeta walks IFD0 in both byte orders and rejects junk") {
    assert(Multimodal.decodeTiffMeta(Multimodal.tiffBytes(512, 384, 6, little = true))
      .contains(("II", Some(512L), Some(384L), Some(6L))))
    assert(Multimodal.decodeTiffMeta(Multimodal.tiffBytes(1, 1, 1, little = false))
      .contains(("MM", Some(1L), Some(1L), Some(1L))))
    assert(Multimodal.decodeTiffMeta(Multimodal.tiffBytes(65535, 2, 8, little = false))
      .contains(("MM", Some(65535L), Some(2L), Some(8L))))
    // wrong magic (43), truncated, and non-TIFF payloads reject cleanly
    val badMagic = Multimodal.tiffBytes(4, 4, 1, little = true)
    badMagic(2) = 43
    assert(Multimodal.decodeTiffMeta(badMagic).isEmpty)
    assert(Multimodal.decodeTiffMeta(Array[Byte]('I', 'I', 42, 0)).isEmpty)
    assert(Multimodal.decodeTiffMeta(Multimodal.pngBytes(4, 4)).isEmpty)
    // truncating mid-IFD must reject, not throw
    val trunc = Multimodal.tiffBytes(512, 384, 6, little = true).take(20)
    assert(Multimodal.decodeTiffMeta(trunc).isEmpty)
  }

  test("decodeTiffMeta reads the JDK's own TIFF encoder output (foreign framing)") {
    // ImageIO ships a TIFF plugin since Java 9 — its directory layout
    // (entry count, tag mix, value offsets) is foreign to tiffBytes.
    assume(javax.imageio.ImageIO.getImageWritersByFormatName("tiff").hasNext)
    val img = new java.awt.image.BufferedImage(
      37, 23, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "tiff", out)
    val m = Multimodal.decodeTiffMeta(out.toByteArray)
    assert(m.exists { case (_, w, h, _) => w.contains(37L) && h.contains(23L) }, m)
  }

  test("decodeBmpMeta reads the JDK encoder's BITMAPINFOHEADER and rejects junk") {
    assert(Multimodal.decodeBmpMeta(Multimodal.bmpBytes(96, 72))
      .contains((96L, 72L, 24L, false)))
    assert(Multimodal.decodeBmpMeta(Multimodal.bmpBytes(1, 1))
      .contains((1L, 1L, 24L, false)))
    // hand-built header with NEGATIVE height = top-down flag
    val td = Multimodal.bmpBytes(8, 4)
    val h = -4
    td(22) = (h & 0xff).toByte; td(23) = ((h >> 8) & 0xff).toByte
    td(24) = ((h >> 16) & 0xff).toByte; td(25) = ((h >> 24) & 0xff).toByte
    assert(Multimodal.decodeBmpMeta(td).contains((8L, 4L, 24L, true)))
    // non-BMP payloads and truncation reject cleanly
    assert(Multimodal.decodeBmpMeta(Multimodal.pngBytes(4, 4)).isEmpty)
    assert(Multimodal.decodeBmpMeta(Multimodal.bmpBytes(9, 9).take(20)).isEmpty)
  }

  test("decodeWbmpMeta reads JDK uintvar headers incl. multi-octet dims") {
    assert(Multimodal.decodeWbmpMeta(Multimodal.wbmpBytes(33, 21))
      .contains((33L, 21L, 4L)))
    // dims past 127 force two-octet uintvars (continuation bit 0x80)
    assert(Multimodal.decodeWbmpMeta(Multimodal.wbmpBytes(200, 150))
      .contains((200L, 150L, 6L)))
    val b = Multimodal.wbmpBytes(200, 150)
    assert((b(2) & 0x80) != 0, "expected a continuation octet")
    // non-WBMP payloads and truncation reject cleanly
    assert(Multimodal.decodeWbmpMeta(Multimodal.pngBytes(4, 4)).isEmpty)
    assert(Multimodal.decodeWbmpMeta(Array[Byte](0, 0)).isEmpty)
  }

  test("decodeAiffMeta reads the JDK sound stack's 80-bit extended rate") {
    for (rate <- Seq(8000, 16000, 22050, 44100, 48000, 96000)) {
      val m = Multimodal.decodeAiffMeta(Multimodal.aiffBytes(rate, 2, 16, 100))
      assert(m.contains((rate.toLong, 2, 16, 100L)), s"rate $rate -> $m")
    }
    assert(Multimodal.decodeAiffMeta(Multimodal.aiffBytes(8000, 1, 8, 0))
      .contains((8000L, 1, 8, 0L)))
    // WAV (little-endian RIFF) is not AIFF; truncation rejects cleanly
    assert(Multimodal.decodeAiffMeta(Multimodal.wavBytes(8000, 1, 8, 4)).isEmpty)
    assert(Multimodal.decodeAiffMeta(
      Multimodal.aiffBytes(8000, 1, 8, 4).take(20)).isEmpty)
    // A COMM whose DECLARED size overruns the buffer is rejected even
    // when its 18 fixed body bytes still fit — same stop-and-count
    // strictness as every other oversize chunk (and as the MIDI walk).
    val corrupt = Multimodal.aiffBytes(8000, 1, 8, 4)
    val ci = {
      var i = 12
      while (!(corrupt(i) == 'C' && corrupt(i + 1) == 'O' &&
        corrupt(i + 2) == 'M' && corrupt(i + 3) == 'M')) i += 1
      i
    }
    corrupt(ci + 4) = 0x7f.toByte // declared COMM length 2^31-ish
    assert(Multimodal.decodeAiffMeta(corrupt).isEmpty)
  }

  test("decodeMidiMeta reads SMF headers and verifies the MTrk walk") {
    for (ppq <- Seq(96, 480); ntr <- Seq(1, 3)) {
      val m = Multimodal.decodeMidiMeta(Multimodal.midiBytes(ppq, ntr))
      assert(m.contains((1, ntr, ppq, ntr.toLong)), s"$ppq/$ntr -> $m")
    }
    // a truncated final track breaks the chunk walk count
    val b = Multimodal.midiBytes(96, 2)
    assert(Multimodal.decodeMidiMeta(b.dropRight(12))
      .exists(_._4 < 2L))
    // SMPTE division (top bit set) is out of contract
    val sm = Multimodal.midiBytes(96, 1)
    sm(12) = 0xE8.toByte
    assert(Multimodal.decodeMidiMeta(sm).isEmpty)
    assert(Multimodal.decodeMidiMeta(Multimodal.wavBytes(8000, 1, 8, 1)).isEmpty)
  }

  test("syntheticTiffs corpus decodes to its id-derived parameters") {
    val ids = Seq(0L, 1L, 2L, 7L, 8L, 511L, 512L)
    val meta = Multimodal.extractTiffMeta(
        Multimodal.syntheticTiffs(ids.toDF("doc_id"), "doc_id"))
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      val m = meta(id)
      assert(m.byte_order == (if (id % 2 == 0) "II" else "MM"))
      assert(m.width.contains(id % 512 + 1))
      assert(m.height.contains(id % 384 + 1))
      assert(m.orientation.contains(id % 8 + 1))
    }
  }
}
