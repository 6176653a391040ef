package graft.operators

import graft.{SparkEntry, SparkSuite}

/** `e8_markov`: first-order transition matrix over per-user event
  * sequences — gated against an independent driver-side recomputation at
  * sf0.001 plus the row-stochastic invariant. */
class MarkovSpec extends SparkSuite {

  test("e8_markov equals an independent per-user transition recount") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("e8_markov")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap

    val ev = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, n) => assert(got(k)._1 === n, k) }

    // row-stochastic: probabilities per prev_type sum to 1 (±rounding)
    got.toSeq.groupBy(_._1._1).foreach { case (prev, rows) =>
      val sum = rows.map(_._2._2).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"$prev sums to $sum")
    }
  }
}
