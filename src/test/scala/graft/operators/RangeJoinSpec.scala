package graft.operators

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed range join == BETWEEN truth, inclusive bounds, no dups") {
    val left = Seq(0.0, 9.99, 10.0, 15.0, 20.0, 20.01, 35.0, 99.0).toDF("v")
    val right = Seq(
      (1L, 10.0, 20.0),   // crosses several bins at w=7
      (2L, 0.0, 0.0),     // degenerate point interval
      (3L, 19.0, 36.0),   // overlaps interval 1
      (4L, 50.0, 60.0))   // matches nothing
      .toDF("id", "lo", "hi")

    for (w <- Seq(0.5, 7.0, 100.0)) {
      val got = RangeJoin.bucketed(left, right, "v", "lo", "hi", w)
        .select("v", "id").as[(Double, Long)].collect().sorted.toSeq
      val truth = left.crossJoin(right)
        .where($"v" >= $"lo" && $"v" <= $"hi")
        .select("v", "id").as[(Double, Long)].collect().sorted.toSeq
      assert(got === truth, s"binWidth $w")
    }
  }
}
