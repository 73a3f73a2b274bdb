package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Wire-level contract of the Avro roundtrip: decoded fields equal the
  * inputs and the payload length matches the PUBLIC spec's zigzag-
  * varint accounting — including the multi-byte boundaries (2v = 128,
  * 16384) the sf corpus may not cross. */
class AvroCodecSpec extends SparkSpec {

  /** Full zigzag-varint ladder for nonnegative longs: byte k covers
    * v < 2^(7k-1) (the halved boundary, since zigzag(v) = 2v here). */
  private def varlen(v: Long): Long = {
    require(v >= 0, v)
    var k = 1L
    var bound = 64L // 2^6
    while (k < 10 && v >= bound) { k += 1; bound = bound << 7 }
    k
  }

  test("roundtrip preserves fields and spec-exact wire sizes at boundaries") {
    import spark.implicits._
    // ids straddle EVERY zigzag-varint byte boundary 2^6..2^62: the
    // last value of byte-width k and the first of k+1, through the
    // 5/6/7-byte arms (2^27, 2^34, 2^41 regions) the sf corpus never
    // reaches, up to the 9-byte 2^62 cliff.
    val rows = Seq(
      (0L, "en", 48L), (63L, "zh", 63L), (64L, "de", 64L),
      (8191L, "fr", 553L), (8192L, "ja", 8192L), (1000000L, "ko", 1048576L),
      (134217727L, "pt", 134217728L),          // 4-byte max / 5-byte min (2^27)
      (17179869183L, "it", 17179869184L),      // 5-byte max / 6-byte min (2^34)
      (2199023255551L, "nl", 2199023255552L),  // 6-byte max / 7-byte min (2^41)
      (281474976710655L, "sv", 281474976710656L),     // 7→8-byte (2^48)
      (36028797018963967L, "pl", 36028797018963968L), // 8→9-byte (2^55)
      (4611686018427387903L, "tr", 4611686018427387904L)) // 9→10-byte (2^62)
    val df = rows.toDF("doc_id", "lang", "n_chars")
    val back = AvroCodec.roundtrip(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(back.map(t => (t._1, t._2, t._3)).toSeq ==
      rows.sortBy(_._1), back.toSeq)
    back.foreach { case (id, lang, n, bytes) =>
      val expect = varlen(id) + 1 + lang.length + varlen(n)
      assert(bytes == expect, s"id=$id: wire $bytes != spec $expect")
    }
  }

  test("non-ASCII strings count UTF-8 bytes, not characters") {
    import spark.implicits._
    val df = Seq((1L, "éé", 10L)).toDF("doc_id", "lang", "n_chars")
    val r = AvroCodec.roundtrip(df).select(col("payload_bytes")).head.getLong(0)
    // 1 (id) + 1 (len prefix = 4 bytes) + 4 utf-8 bytes + 1 (n) = 7
    assert(r == 7L, r)
  }

  test("string length prefix rolls to 2 bytes at 64 BYTES, not 128") {
    import spark.implicits._
    // zigzag(64) = 128 needs two varint bytes — the prefix boundary is
    // byte-length 64 (the ADVICE-flagged < 128 off-by-one).
    val rows = Seq((1L, "a" * 63, 5L), (2L, "b" * 64, 5L), (3L, "é" * 32, 5L))
    val df = rows.toDF("doc_id", "lang", "n_chars")
    val got = AvroCodec.roundtrip(df).orderBy("doc_id")
      .select(col("doc_id"), col("payload_bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1 + 1 + 63 + 1, got) // 63 bytes → 1-byte prefix
    assert(got(2L) == 1 + 2 + 64 + 1, got) // 64 bytes → 2-byte prefix
    assert(got(3L) == 1 + 2 + 64 + 1, got) // 32 chars = 64 UTF-8 bytes
  }
}
