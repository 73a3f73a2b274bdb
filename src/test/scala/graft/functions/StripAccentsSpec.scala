package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StripAccents (native codegen expression): folds both composed and
  * decomposed accents, leaves mark-free specials, propagates null, and
  * stays registered for SQL text. Non-ASCII cases are built from code
  * points so composed vs decomposed forms are unambiguous in source.
  */
class StripAccentsSpec extends SparkSpec {
  import spark.implicits._

  private def cp(codePoints: Int*): String =
    codePoints.map(Character.toChars(_).mkString).mkString

  private def strip(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(graft.functions.strip_accents(col("t"))).head.getString(0)

  test("folds composed and decomposed accents to base letters") {
    assert(strip("caf" + cp(0xE9)) == "cafe")          // precomposed é
    assert(strip("cafe" + cp(0x301)) == "cafe")        // e + combining acute
    assert(strip(cp(0xC5) + "bo") == "Abo")            // precomposed Å
    assert(strip("A" + cp(0x30A) + "bo") == "Abo")     // A + combining ring
    assert(strip("e" + cp(0x301, 0x327)) == "e")       // stacked marks both dropped
  }

  test("identity on ASCII and on mark-free non-ASCII letters") {
    assert(strip("plain ascii 123") == "plain ascii 123")
    // æ, ø, ß have no combining marks — folding them would be lossy
    // transliteration, not accent stripping (DuckDB strip_accents agrees).
    assert(strip(cp(0xE6, 0xF8, 0xDF)) == cp(0xE6, 0xF8, 0xDF))
    assert(strip(cp(0x1F600)) == cp(0x1F600))          // non-BMP passthrough
  }

  test("null propagates; SQL registration works; codegen path used") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "caf" + cp(0xE9)))
      .toDF("id", "t")
      .selectExpr("id", "strip_accents(t) AS s")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty && out(2L).contains("cafe"))
  }
}
