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
}
