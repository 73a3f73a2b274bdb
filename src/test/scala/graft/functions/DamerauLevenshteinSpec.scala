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

  test("symmetry and triangle sanity") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("ca", "abc"))
    pairs.foreach { case (a, b) => assert(dl(a, b) == dl(b, a)) }
    // distance bounded by max length
    assert(dl("abcdefgh", "zyxw") <= 8)
  }
}
