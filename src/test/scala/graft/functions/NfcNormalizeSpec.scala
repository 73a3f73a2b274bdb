package graft.functions

import java.text.Normalizer

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NfcNormalize (native codegen expression): canonical composition,
  * identity on already-normalized text, null propagation, SQL-text
  * registration, and agreement with java.text.Normalizer as the
  * independent reference. All non-ASCII test data is built from
  * escape sequences so composed vs decomposed forms are unambiguous
  * in source (Scala pre-lexes \uXXXX, so the strings are concatenated
  * from runtime-built code points instead).
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def cp(codePoints: Int*): String =
    codePoints.map(Character.toChars(_).mkString).mkString

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(graft.functions.nfc_normalize(col("t"))).head.getString(0)

  test("composes decomposed sequences (combining marks -> precomposed)") {
    // e + combining acute (U+0301) -> U+00E9
    assert(norm("cafe" + cp(0x301)) == "caf" + cp(0xE9))
    // A + combining ring (U+030A) -> U+00C5
    assert(norm("A" + cp(0x30A)) == cp(0xC5))
    // Hangul jamo pair (U+1100 U+1161) composes to the syllable U+AC00.
    assert(norm(cp(0x1100, 0x1161)) == cp(0xAC00))
  }

  test("identity on ASCII and already-NFC text; NFKC-only forms preserved") {
    assert(norm("plain ascii 123") == "plain ascii 123")
    assert(norm("caf" + cp(0xE9)) == "caf" + cp(0xE9))
    // NFC must NOT touch compatibility forms: the fi-ligature (U+FB01)
    // and a fullwidth digit (U+FF11) survive - folding them is NFKC.
    assert(norm(cp(0xFB01) + "ne") == cp(0xFB01) + "ne")
    assert(norm(cp(0xFF11)) == cp(0xFF11))
  }

  test("matches java.text.Normalizer on mixed and non-BMP input") {
    val cases = Seq(
      "e" + cp(0x301, 0x327) + "x", // stacked marks: acute then cedilla (canonical reorder + compose)
      "o" + cp(0x308, 0x304),       // o + diaeresis + macron -> U+022B
      cp(0x1F600) + "a" + cp(0x30A), // non-BMP emoji then a decomposed ring
      "",
      cp(0xE9) + "e" + cp(0x301))   // composed e-acute followed by decomposed
    cases.foreach { s =>
      assert(norm(s) == Normalizer.normalize(s, Normalizer.Form.NFC), s"case: ${s.codePoints.toArray.toSeq}")
    }
  }

  test("null propagates and SQL-text registration works") {
    val r = Seq((Some("a" + cp(0x301)), None: Option[String])).toDF("a", "b")
      .selectExpr("nfc_normalize(a) AS na", "nfc_normalize(b) AS nb").head
    assert(r.getString(0) == cp(0xE1))
    assert(r.isNullAt(1))
  }

  test("length contract the text_normalize query relies on") {
    // Appending decomposed " cafe<U+0301> A<U+030A>" adds 9 codepoints
    // raw; NFC composes two pairs, so the normalized form adds 7.
    val suffix = " cafe" + cp(0x301) + " A" + cp(0x30A)
    val df = Seq(Tuple1("abc")).toDF("t")
      .select(
        length(concat(col("t"), lit(suffix))).as("raw"),
        length(graft.functions.nfc_normalize(
          concat(col("t"), lit(suffix)))).as("norm"))
    val r = df.head
    assert(r.getInt(0) == 3 + 9 && r.getInt(1) == 3 + 7, r.toString)
  }
}
