package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DeflateRatio (native codegen expression): ordering semantics —
  * repetitive text compresses far below distinct text — plus the
  * empty/null contract and SQL-text registration. Exact compressed
  * byte counts are deliberately NOT pinned (zlib version detail). */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.register(spark)

  private def ratio(s: String): Double =
    Seq(Tuple1(s)).toDF("t")
      .select(graft.functions.deflate_ratio(col("t"))).head.getDouble(0)

  test("repetitive text compresses far below distinct text") {
    val repetitive = "the same line over and over\n" * 200
    val rng = new scala.util.Random(42)
    val distinct = Seq.fill(200)(rng.alphanumeric.take(24).mkString).mkString("\n")
    val rr = ratio(repetitive)
    val rd = ratio(distinct)
    assert(rr < 0.1, s"repetitive ratio $rr")
    assert(rd > 0.3, s"distinct ratio $rd")
    assert(rr < rd / 3)
  }

  test("empty string reports 1.0; null propagates; tiny strings stay finite") {
    assert(ratio("") == 1.0)
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(graft.functions.deflate_ratio(col("t"))).head
    assert(n.isNullAt(0))
    assert(ratio("a") > 0)
  }

  test("callable from SQL text and stable per input") {
    val r = spark.sql("SELECT deflate_ratio('abcabcabcabcabcabc') AS r").head.getDouble(0)
    assert(r > 0 && r < 1.5)
    assert(ratio("abcabcabcabcabcabc") == r)
  }
}
