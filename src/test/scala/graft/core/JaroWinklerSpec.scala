package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors for the Jaro–Winkler kernel — the classic
  * record-linkage literature pairs plus the convention edges the DuckDB
  * oracle contract pins (empty → 0, boost only above 0.7). */
class JaroWinklerSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("literature vectors: martha/marhta, dixon/dicksonx, duane/dwayne") {
    assert(approx(JaroWinkler.jaro("martha", "marhta"), 17.0 / 18))
    assert(approx(JaroWinkler.similarity("martha", "marhta"),
      17.0 / 18 + 3 * 0.1 * (1 - 17.0 / 18)))
    assert(approx(JaroWinkler.jaro("dixon", "dicksonx"), 23.0 / 30))
    assert(approx(JaroWinkler.similarity("dixon", "dicksonx"),
      23.0 / 30 + 2 * 0.1 * (1 - 23.0 / 30)))
    assert(approx(JaroWinkler.similarity("duane", "dwayne"), 0.84))
  }

  test("convention edges: empty scores 0, identical scores 1") {
    assert(JaroWinkler.similarity("", "") === 0.0)
    assert(JaroWinkler.similarity("a", "") === 0.0)
    assert(JaroWinkler.similarity("", "abc") === 0.0)
    assert(JaroWinkler.similarity("abc", "abc") === 1.0)
  }

  test("window: adjacent swap in a 2-char string is out of match range") {
    // max(2,2)/2 - 1 = 0: only same-position chars can match
    assert(JaroWinkler.similarity("ab", "ba") === 0.0)
  }

  test("boost gates on jaro > 0.7 and prefix caps at 4 chars") {
    // jaro(ab, axxxxxxxxx) = (1/2 + 1/10 + 1)/3 < 0.7: boost suppressed
    val low = JaroWinkler.jaro("ab", "axxxxxxxxx")
    assert(low < 0.7)
    assert(JaroWinkler.similarity("ab", "axxxxxxxxx") === low)
    // shared 5-char prefix still boosts with l = 4 only
    val j = JaroWinkler.jaro("abcdef", "abcdex")
    assert(approx(JaroWinkler.similarity("abcdef", "abcdex"),
      j + 4 * 0.1 * (1 - j)))
  }

  test("transpositions count half the out-of-order matched pairs") {
    // crate/trace: m=5... classic value 11/15; no common prefix, no boost
    assert(approx(JaroWinkler.similarity("crate", "trace"), 11.0 / 15))
  }

  test("symmetry on asymmetric-length pairs") {
    for ((a, b) <- Seq(("jellyfish", "smellyfish"), ("dixon", "dicksonx"),
      ("x", "xyzzy"))) {
      assert(JaroWinkler.similarity(a, b) === JaroWinkler.similarity(b, a))
    }
  }
}
