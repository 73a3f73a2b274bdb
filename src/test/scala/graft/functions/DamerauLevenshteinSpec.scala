package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[DamerauLevenshtein.distance]] to the TRUE (unrestricted)
  * Damerau-Levenshtein semantics — expected values cross-checked
  * against DuckDB's independent `damerau_levenshtein` (the er_damerau
  * driver query re-checks the same agreement on real blocked pairs). */
class DamerauLevenshteinSpec extends AnyFunSuite {

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("reduces to Levenshtein when no transpositions help") {
    assert(dl("kitten", "sitting") == 3)
    assert(dl("flaw", "lawn") == 2)
    assert(dl("abc", "abc") == 0)
    assert(dl("abc", "axc") == 1)
  }

  test("adjacent transposition costs 1") {
    assert(dl("ab", "ba") == 1)
    assert(dl("abcdef", "abcfed") == 2) // d↔f swap via transposition + sub
    assert(dl("banana", "banaan") == 1)
  }

  test("unrestricted variant: edits allowed between transposed pair") {
    // OSA scores CA→ABC as 3; the true variant transposes C,A then
    // inserts B between them for 2. DuckDB agrees (=2).
    assert(dl("CA", "ABC") == 2)
    assert(dl("ABC", "CA") == 2)
  }

  test("empty and length edges") {
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abcd", "") == 4)
    assert(dl("a", "a") == 0)
  }

  test("non-BMP text compares per codepoint, not per UTF-16 unit") {
    // Each emoji is one codepoint (a surrogate pair in UTF-16): a
    // per-char compare would score a deletion as 2 unit edits, and a
    // swap of two emoji would not be a single transposition. (DuckDB's
    // implementation is per UTF-8 byte — 'a😀b'→'ab' = 4 there — which
    // is why the cross-engine oracle feeds ASCII keys only.)
    assert(dl("😀", "😀") == 0)
    assert(dl("😀", "😁") == 1) // one substitution, not two
    assert(dl("a😀b", "ab") == 1) // one codepoint deletion
    assert(dl("😀😁", "😁😀") == 1) // one transposition of two codepoints
  }

  test("symmetry and triangle sanity") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("ca", "abc"))
    pairs.foreach { case (a, b) => assert(dl(a, b) == dl(b, a)) }
    // distance bounded by max length
    assert(dl("abcdefgh", "zyxw") <= 8)
  }

  test("randomized metric laws over a small alphabet") {
    // Small alphabet (3 letters) maximizes transposition/coincidence
    // cases the classic examples miss.
    val rnd = new scala.util.Random(1234)
    def randStr(): String =
      (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    def lev(a: String, b: String): Int = {
      // plain Levenshtein reference (no transpositions)
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (_ <- 1 to 300) {
      val (a, b, c) = (randStr(), randStr(), randStr())
      val dab = dl(a, b)
      assert(dab == dl(b, a), s"symmetry failed on ($a, $b)")
      assert((dab == 0) == (a == b), s"identity failed on ($a, $b)")
      // true DL is a metric: triangle inequality holds
      assert(dab <= dl(a, c) + dl(c, b), s"triangle failed on ($a, $b, $c)")
      // bounded above by plain Levenshtein (transpositions only help)
      // and below by half of it (one transposition fixes <= 2 subs)
      val lv = lev(a, b)
      assert(dab <= lv && 2 * dab >= lv, s"Levenshtein bounds failed on ($a, $b)")
      // and below by the length difference
      assert(dab >= math.abs(a.length - b.length))
    }
  }
}
