package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** [[Kmv]]: k-minimum-values distinct sketches and their merged-sketch
  * Jaccard estimates. The sketch arithmetic is oracle-checked
  * (`a13_kmv_distinct` / `a14_kmv_jaccard` — the sketch is deterministic,
  * so the oracle pins it bit for bit); these tests pin the ESTIMATOR
  * QUALITY on constructed sets with known cardinality and known partial
  * overlap, which the uniform testdata (every user in every event type,
  * Jaccard 1) cannot exercise. */
class KmvSpec extends SparkSuite {
  import spark.implicits._

  /** Integer key sets with controlled overlap: group -> inclusive id
    * range. Ranges [0,999] vs [500,1499] give |∩|=500, |∪|=1500,
    * J = 1/3. */
  private def sets(ranges: (String, (Long, Long))*): DataFrame =
    ranges.flatMap { case (g, (lo, hi)) => (lo to hi).map(g -> _) }
      .toDF("grp", "key")

  test("distinctEstimate: within the k-min error bound on 1000-element sets") {
    val d = sets("a" -> (0L, 999L), "b" -> (5000L, 5999L))
    val rows = Kmv.distinctEstimate(d, "grp", "key", k = 64)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("kmv_est"), r.getAs[Long]("exact_keys")))).toMap
    assert(rows.keySet === Set("a", "b"))
    rows.foreach { case (g, (est, exact)) =>
      assert(exact === 1000L)
      // rsd = 1/sqrt(k-2) ≈ 12.7%; 4σ keeps the deterministic draw safe
      assert(math.abs(est - exact) / exact <= 0.51,
        s"group $g estimate $est vs exact $exact")
    }
  }

  test("distinctEstimate: below k the sketch IS the exact set") {
    val d = sets("s" -> (10L, 29L)) // 20 < k
    val r = Kmv.distinctEstimate(d, "grp", "key", k = 64).collect().head
    assert(r.getAs[Long]("n_h") <= 20L) // hash collisions may only shrink
    assert(r.getAs[Double]("kmv_est") === r.getAs[Long]("n_h").toDouble)
  }

  test("jaccardEstimate: recovers a known 1/3 overlap within sketch error") {
    val d = sets("a" -> (0L, 999L), "b" -> (500L, 1499L))
    val r = Kmv.jaccardEstimate(d, "grp", "key", k = 64).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("grp_a") === "a" &&
      row.getAs[String]("grp_b") === "b")
    val est = row.getAs[Double]("jacc_est")
    val exact = row.getAs[Double]("jacc_exact")
    // exact rides on the HASHED sets: collisions can nudge it off 1/3
    assert(math.abs(exact - 1.0 / 3.0) <= 0.02, s"hashed-set J = $exact")
    // 1σ ≈ sqrt(J(1-J)/k) ≈ 0.059; allow 4σ for the deterministic draw
    assert(math.abs(est - exact) <= 0.24, s"est $est vs exact $exact")
  }

  test("jaccardEstimate: disjoint and identical sets hit the exact ends") {
    val d = sets("a" -> (0L, 499L), "b" -> (100000L, 100499L),
      "c" -> (0L, 499L))
    val rows = Kmv.jaccardEstimate(d, "grp", "key", k = 64).collect()
      .map(r => (r.getAs[String]("grp_a"), r.getAs[String]("grp_b")) ->
        ((r.getAs[Double]("jacc_est"), r.getAs[Double]("jacc_exact"))))
      .toMap
    assert(rows(("a", "b")) === ((0.0, 0.0)))
    assert(rows(("a", "c")) === ((1.0, 1.0)))
  }
}
