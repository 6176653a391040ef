package graft.core

import org.apache.spark.unsafe.types.UTF8String

/** Byte-histogram pigeonhole kernels — the cheap lossless prefilters in
  * front of the O(len²) string kernels of the fuzzy dedup lanes
  * (Levenshtein, Jaro–Winkler). Both operate on a 129-bin histogram of a
  * string's UTF-8 bytes: bins 0–127 count each ASCII byte, bin 128 counts
  * every non-ASCII byte (any byte ≥ 0x80 — in UTF-8 all bytes of a
  * multi-byte character are ≥ 0x80).
  *
  * Filter soundness (the pair is NEVER dropped when the expensive kernel
  * would accept it):
  *
  *  - [[l1]] sums |countA − countB| over the ASCII bins ONLY. One edit
  *    (insert / delete / substitute) touches at most one counted byte on
  *    each side, so `levenshtein(a, b) ≤ d ⇒ l1(a, b) ≤ 2·d`; edits on
  *    multi-byte characters move only the uncounted bin and contribute 0.
  *    Filtering on `l1 ≤ 2·d` therefore keeps every true match (and a
  *    superset: lumped non-ASCII differences are invisible, which only
  *    ADMITS extra pairs).
  *  - [[common]] sums `min(countA, countB)` over ALL 129 bins. The Jaro
  *    match count m pairs characters one-to-one, so every matched ASCII
  *    character consumes one occurrence of the same bin on each side
  *    (m_ascii ≤ Σ_ascii min) and every matched multi-byte character
  *    contributes ≥ 2 bytes to BOTH non-ASCII counts
  *    (m_multi ≤ min(bin128)); hence `m ≤ common(a, b)` and a lower
  *    bound on m derived from a Jaro–Winkler threshold can be tested
  *    against `common` without losing matches.
  *
  * One pass over each string, two small int arrays, no boxing — ~O(lenA +
  * lenB + 129) per pair versus the quadratic kernels' O(lenA · lenB).
  */
object CharHist {

  private def fill(h: Array[Int], s: UTF8String): Unit = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) h(b) += 1 else h(128) += 1
      i += 1
    }
  }

  /** Σ over ASCII bins of |countA − countB| (non-ASCII bytes ignored). */
  def l1(a: UTF8String, b: UTF8String): Int = {
    val ha = new Array[Int](129)
    val hb = new Array[Int](129)
    fill(ha, a); fill(hb, b)
    var s = 0
    var i = 0
    while (i < 128) { s += math.abs(ha(i) - hb(i)); i += 1 }
    s
  }

  /** Σ over all 129 bins of min(countA, countB). */
  def common(a: UTF8String, b: UTF8String): Int = {
    val ha = new Array[Int](129)
    val hb = new Array[Int](129)
    fill(ha, a); fill(hb, b)
    var s = 0
    var i = 0
    while (i < 129) { s += math.min(ha(i), hb(i)); i += 1 }
    s
  }
}
