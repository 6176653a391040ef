package graft.core

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz-pinned soundness of the byte-histogram prefilter kernels: the
  * bounds they implement must NEVER reject a pair the expensive kernel
  * (Levenshtein / Jaro–Winkler) would accept — that is what makes them
  * admissible candidate filters in the dedup lanes. */
class CharHistSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  /** Deterministic xorshift so the fuzz corpus is reproducible. */
  private var state = 0x9e3779b97f4a7c15L
  private def nextLong(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }
  private def nextInt(n: Int): Int = (math.abs(nextLong()) % n).toInt

  private val alphabet = "abcdefghij mnop".toCharArray
  private def randString(maxLen: Int): String =
    Array.fill(1 + nextInt(maxLen))(alphabet(nextInt(alphabet.length)))
      .mkString

  /** Reference Levenshtein (full DP) for the fuzz oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("hand-checked histograms") {
    assert(CharHist.l1(u("abc"), u("abd")) === 2) // c vs d
    assert(CharHist.l1(u("aab"), u("ab")) === 1)
    assert(CharHist.l1(u(""), u("")) === 0)
    assert(CharHist.common(u("abc"), u("cba")) === 3)
    assert(CharHist.common(u("aab"), u("abb")) === 2)
    assert(CharHist.common(u("abc"), u("xyz")) === 0)
  }

  test("non-ASCII bytes: excluded from l1, over-counted into common") {
    // 'é' is 2 UTF-8 bytes ≥ 0x80: substituting it must not move l1
    assert(CharHist.l1(u("café"), u("cafè")) === 0)
    // but both sides' non-ASCII bytes meet in the common lump bin
    assert(CharHist.common(u("é"), u("è")) === 2)
  }

  test("fuzz: lev(a,b) <= d implies l1(a,b) <= 2*d (1500 pairs)") {
    (1 to 1500).foreach { _ =>
      val a = randString(30)
      // half the pairs are mutations of a (close), half independent
      val b =
        if (nextInt(2) == 0) randString(30)
        else {
          val sb = new StringBuilder(a)
          (0 until nextInt(6)).foreach { _ =>
            val op = nextInt(3)
            val pos = if (sb.isEmpty) 0 else nextInt(sb.length)
            op match {
              case 0 if sb.nonEmpty => sb.deleteCharAt(pos)
              case 1 => sb.insert(pos, alphabet(nextInt(alphabet.length)))
              case _ if sb.nonEmpty =>
                sb.setCharAt(pos, alphabet(nextInt(alphabet.length)))
              case _ => ()
            }
          }
          sb.mkString
        }
      val d = lev(a, b)
      val l1 = CharHist.l1(u(a), u(b))
      assert(l1 <= 2 * d, s"l1=$l1 > 2*lev=$d for '$a' vs '$b'")
    }
  }

  test("fuzz: Jaro match count m <= common(a,b) (1500 pairs)") {
    // jaro = (m/|a| + m/|b| + (m-t)/m)/3 with (m-t)/m <= 1 gives
    // m >= (3*jaro - 2) * max(|a|,|b|); common must dominate that m
    // bound whenever the true jw does (the filter's admissibility).
    (1 to 1500).foreach { _ =>
      val a = randString(25)
      val b = randString(25)
      val j = JaroWinkler.jaro(a, b)
      val mLower = (3 * j - 2) * math.max(a.length, b.length)
      val c = CharHist.common(u(a), u(b))
      assert(c.toDouble >= mLower - 1e-9,
        s"common=$c < m bound $mLower for '$a' vs '$b' (jaro=$j)")
    }
  }
}
