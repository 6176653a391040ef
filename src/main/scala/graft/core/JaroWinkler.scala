package graft.core

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) — the string-metric
  * kernel of the fuzzy entity-resolution lane.
  *
  * Semantics are pinned to the portable convention DuckDB's
  * `jaro_winkler_similarity` also implements (so the lane's oracle can be
  * cross-engine): prefix weight 0.1 over at most 4 common leading
  * characters, the Winkler boost applied only when the Jaro score
  * exceeds 0.7, and `0.0` when either string is empty (including
  * empty-vs-empty). Verified against DuckDB on 3 000 fuzzed pairs with
  * zero double-precision mismatches. Characters are UTF-16 code units;
  * for the ASCII columns this engine matches on, that coincides with
  * bytes and codepoints alike.
  *
  * The two-pass shape (greedy in-window matching, then transposition
  * count over the matched subsequences) is the textbook O(len₁·len₂)
  * worst case but O(len·window) in practice; the kernel allocates two
  * boolean arrays and nothing else, so it inlines cleanly into
  * whole-stage codegen via [[graft.functions]]' `jaro_winkler`
  * expression.
  */
object JaroWinkler {

  /** Plain Jaro similarity in [0, 1]. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true
          m2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val transpositions = t / 2
    (m.toDouble / l1 + m.toDouble / l2 +
      (m - transpositions).toDouble / m) / 3.0
  }

  /** Jaro–Winkler: Jaro plus the common-prefix boost
    * `ℓ · 0.1 · (1 − jaro)` (ℓ ≤ 4) when jaro > 0.7. */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val n = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < n && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}
