package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Privacy lane: known-answer k-anonymity/l-diversity on a hand-built
  * customer table, plus the Laplace-mechanism invariants (determinism,
  * zero noise never happens, re-derivation equality) the priv2 gate
  * relies on. */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  /** customer(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment). */
  private def customerOf(rows: Seq[(Int, Double, String)]): DataFrame =
    rows.zipWithIndex.map { case ((nat, bal, seg), i) =>
      (i.toLong, s"c$i", nat, bal, seg)
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  // QI = (nation, floor(bal/10)): groups at width 10 —
  //   (1, 0): rows 0,1,2 (bal 1,5,9; segs A,A,B) → sz 3, ndist 2
  //   (1, 1): row 3 (bal 15, A)                  → sz 1, ndist 1
  //   (2, 0): rows 4,5 (bal 3,4; B,B)            → sz 2, ndist 1
  // → k=1, l=1, groups<2: 1 (sz 1), rows_at_risk 1
  private val rows = Seq(
    (1, 1.0, "A"), (1, 5.0, "A"), (1, 9.0, "B"), (1, 15.0, "A"),
    (2, 3.0, "B"), (2, 4.0, "B"))

  test("kAnonymityLadder: known-answer at one rung") {
    val r = Privacy.kAnonymityLadder(customerOf(rows), Seq(10), k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((10L, 3L, 1L, 1L, 1L, 1L)))
  }

  test("kAnonymityLadder: coarser bands are monotone in k and group count") {
    // width 100 merges each nation to one group: (1: sz 4, ndist 2),
    // (2: sz 2, ndist 1) → k=2, l=1, nothing below k=2
    val r = Privacy.kAnonymityLadder(customerOf(rows), Seq(10, 100), k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length === 2)
    assert(r(1) === ((100L, 2L, 2L, 1L, 0L, 0L)))
    assert(r(1)._3 >= r(0)._3) // k never decreases as bands widen
    assert(r(1)._2 <= r(0)._2) // group count never increases
  }

  test("kAnonymityLadder: negative balances band by floor, not truncation") {
    // bal -1 → floor(-0.1) = -1, distinct from bal 1's band 0
    val r = Privacy.kAnonymityLadder(
      customerOf(Seq((1, -1.0, "A"), (1, 1.0, "A"))), Seq(10), k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.head._2 === 2L) // two groups, not one
  }

  test("kSuppress: at-risk rows are suppressed, survivors carry the " +
      "generalized band and their cover size") {
    // width 10, k=2 (groups from `rows`): (1,0) sz 3 kept; (1,1) sz 1
    // SUPPRESSED (row 3, custkey 3); (2,0) sz 2 kept
    val r = Privacy.kSuppress(customerOf(rows), width = 10, k = 2)
      .as[(Long, Int, Long, Long)].collect()
    assert(r.map(_._1).toSeq === Seq(0L, 1L, 2L, 4L, 5L)) // custkey 3 gone
    assert(r.filter(_._2 == 1).forall(x => x._3 == 0L && x._4 == 3L))
    assert(r.filter(_._2 == 2).forall(x => x._3 == 0L && x._4 == 2L))
    // every released row hides among >= k rows — the k-anonymity contract
    assert(r.forall(_._4 >= 2L))
  }

  test("dpCounts: deterministic for a fixed seed, different across seeds") {
    val c = customerOf(rows)
    val a = Privacy.dpCounts(c, 0.5, 7).as[(String, Double, Double)].collect()
    val b = Privacy.dpCounts(c, 0.5, 7).as[(String, Double, Double)].collect()
    val d = Privacy.dpCounts(c, 0.5, 8).as[(String, Double, Double)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).toSeq !== d.map(_._2).toSeq)
  }

  test("dpCounts: noise is non-degenerate and scales with 1/epsilon") {
    val c = customerOf(rows)
    val exact = Map("A" -> 3.0, "B" -> 3.0)
    val tight = Privacy.dpCounts(c, 10.0, 7).as[(String, Double, Double)]
      .collect().map { case (s, n, _) => math.abs(n - exact(s)) }
    val loose = Privacy.dpCounts(c, 0.1, 7).as[(String, Double, Double)]
      .collect().map { case (s, n, _) => math.abs(n - exact(s)) }
    assert(tight.forall(_ > 0.0)) // the mechanism always perturbs
    // same uniform draw, scale b=1/ε 100× larger → 100× the deviation.
    // Both releases round to 6 decimals, so compare with the absolute
    // tolerance that rounding induces (≤ 5e-7 each side, ×100 on one).
    tight.zip(loose).foreach { case (t, l) =>
      assert(math.abs(l - 100.0 * t) < 1e-4) }
  }

  test("dpVerify: gate is clean on the real shape and catches nothing fake") {
    val r = Privacy.dpVerify(customerOf(rows), 0.5, 7)
      .as[(Long, Long, Long)].collect().head
    assert(r === ((2L, 0L, 0L)))
  }

  test("tCloseness: hand-computed TVD, including group-absent segments") {
    // Global: A 3, B 3 (p = ½ each). Group (1, 0) = {A, B}: TVD 0.
    // Group (2, 0) = {A, A}: TVD = ½·(|1 − ½| + (1 − ½)) = ½ — the
    // folded form charges absent B its global mass. Group (3, 0) =
    // {B, B}: ½ by symmetry.
    val c = Seq(
      (1L, "x", 1L, 10.0, "A"), (2L, "x", 1L, 20.0, "B"),
      (3L, "x", 2L, 30.0, "A"), (4L, "x", 2L, 40.0, "A"),
      (5L, "x", 3L, 50.0, "B"), (6L, "x", 3L, 60.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val got = Privacy.tCloseness(c, width = 1000, t = 0.2)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 2L, 0.0, true),
      (2L, 0L, 2L, 0.5, false),
      (3L, 0L, 2L, 0.5, false)))
  }

  test("entropyLDiversity: hand-computed effective segment counts on " +
      "the ladder fixture") {
    // width 10 groups (from `rows`):
    //   (1,0) {A:2, B:1}: sq = round(2·ln2·1e6) = 1386294,
    //     H = ln3 − 1386294/3e6 → exp(H) = 1.889882 (< l=3 → fail)
    //   (1,1) {A:1}: H = ln1 − 0 = 0 → 1.0
    //   (2,0) {B:2}: H = ln2 − 1386294/2e6 ≈ 2e-7 → rounds to 1.0
    val got = Privacy.entropyLDiversity(customerOf(rows), width = 10,
      l = 3.0).as[(Int, Long, Long, Long, Double, Boolean)]
      .collect().toSeq
    assert(got === Seq(
      (1, 0L, 3L, 2L, 1.889882, false),
      (1, 1L, 1L, 1L, 1.0, false),
      (2, 0L, 2L, 1L, 1.0, false)))
  }

  test("entropyLDiversity: a uniform group attains its distinct count " +
      "(up to the 1e6 quantization grid) and passes at that l") {
    // {A:2, B:2, C:2}: exact H = ln3, exp = 3; the quantized cells land
    // at 3.000001 — the grid artifact is ABOVE the exact value, so the
    // rounded-before-threshold pass at l=3 is stable
    val c = Seq(
      (1L, "x", 1L, 1.0, "A"), (2L, "x", 1L, 2.0, "A"),
      (3L, "x", 1L, 3.0, "B"), (4L, "x", 1L, 4.0, "B"),
      (5L, "x", 1L, 5.0, "C"), (6L, "x", 1L, 6.0, "C"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val got = Privacy.entropyLDiversity(c, width = 1000, l = 3.0)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq((1L, 0L, 6L, 3L, 3.000001, true)))
  }

  test("entropyLDiversity: a skewed group fails where its distinct " +
      "count alone would pass — the strictness the lane exists for") {
    // {A:8, B:1, C:1}: l_distinct = 3 ≥ 3 would pass the ladder's
    // count form, but H = ln10 − 8·ln8/10 ≈ 0.639 → exp ≈ 1.9 < 3
    val c = (1L to 8L).map(i => (i, "x", 1L, i.toDouble, "A")) ++
      Seq((9L, "x", 1L, 9.0, "B"), (10L, "x", 1L, 10.0, "C"))
    val got = Privacy.entropyLDiversity(
      c.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"), width = 1000, l = 3.0)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.head._4 === 3L)     // distinct count says diverse
    assert(got.head._5 < 2.0)      // entropy says concentrated
    assert(got.head._6 === false)  // and the gate fails it
  }
}
