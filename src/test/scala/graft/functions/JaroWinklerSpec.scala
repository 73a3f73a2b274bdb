package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JaroWinkler.similarity]] to the conventional semantics —
  * expected values cross-checked against DuckDB's independent
  * `jaro_winkler_similarity` (the er_jaro driver query re-checks the
  * same agreement on real blocked pairs). */
class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  private def close(x: Double, y: Double): Boolean = math.abs(x - y) < 1e-12

  test("classic Winkler examples") {
    assert(close(jw("martha", "marhta"), 0.9611111111111111))
    assert(close(jw("dixon", "dicksonx"), 0.8133333333333332))
    assert(close(jw("duane", "dwayne"), 0.8400000000000001))
    assert(close(jw("TRATE", "TRACE"), 0.9066666666666667))
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // jaro = 2/3 with common prefix 4: must NOT be boosted.
    assert(close(jw("abcdzzzz", "abcdyyyy"), 0.6666666666666666))
    // jaro ≈ 0.722 with prefix 2: boosted.
    assert(close(jw("ab", "abzzzzzzzzzz"), 0.7777777777777779))
  }

  test("edge cases: empty, identical, zero-window, no matches") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    // window = 0 for two 2-char strings: a transposed pair scores 0.
    assert(jw("ab", "ba") == 0.0)
    assert(jw("xyz", "abc") == 0.0)
  }

  test("prefix cap at 4 and transposition counting") {
    assert(close(jw("jellyfish", "smellyfish"), 0.8962962962962964))
    assert(close(jw("kitten", "sitting"), 0.746031746031746))
    // 30 common chars, prefix capped at 4.
    val a = "a" * 30 + "x"; val b = "a" * 30 + "y"
    assert(close(jw(a, b), 0.9870967741935484))
  }

  test("symmetry") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("ab", "abzzzz"))
    pairs.foreach { case (a, b) => assert(jw(a, b) == jw(b, a)) }
  }
}
