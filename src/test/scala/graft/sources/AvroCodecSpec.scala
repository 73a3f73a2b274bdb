package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Wire-level contract of the Avro roundtrip: decoded fields equal the
  * inputs and the payload length matches the PUBLIC spec's zigzag-
  * varint accounting — including the multi-byte boundaries (2v = 128,
  * 16384) the sf corpus may not cross. */
class AvroCodecSpec extends SparkSpec {

  private def varlen(v: Long): Long = {
    val z = 2 * v
    if (z < 128) 1 else if (z < 16384) 2 else if (z < 2097152) 3 else 4
  }

  test("roundtrip preserves fields and spec-exact wire sizes at boundaries") {
    import spark.implicits._
    // ids straddle the 1/2/3-byte zigzag-varint boundaries: 2v < 128,
    // = 128, < 16384, = 16384, beyond.
    val rows = Seq(
      (0L, "en", 48L), (63L, "zh", 63L), (64L, "de", 64L),
      (8191L, "fr", 553L), (8192L, "ja", 8192L), (1000000L, "ko", 1048576L))
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
}
