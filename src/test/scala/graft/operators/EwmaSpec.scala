package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins `w6_ewma`'s closed form against the defining recursion
  * `s_1 = x_1; s_i = x_i/2 + s_{i-1}/2`, computed naively on the driver
  * from the same (ts, event_id)-ordered suffix. The oracle twin checks
  * cross-engine agreement; this checks the algebra itself. */
class EwmaSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("w6_ewma closed form equals the EWMA recursion, per user") {
    val got = graft.SparkEntry.queries("w6_ewma")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap

    val events = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).map { case (uid, rows) =>
      val suffix = rows.sortBy(r => (r._2, r._3)).takeRight(32).map(_._4)
      val s = suffix.tail.foldLeft(suffix.head)((acc, x) => x / 2 + acc / 2)
      uid -> (suffix.length.toLong,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    assert(got.keySet === expected.keySet)
    for ((uid, (n, e)) <- expected) {
      assert(got(uid)._1 === n, s"user $uid n_events")
      // the driver recursion and the scaled cumulative sum associate
      // differently; with power-of-two weights both are exact except for
      // the additions, so they agree far inside the 6-decimal rounding
      assert(math.abs(got(uid)._2 - e) < 1e-6, s"user $uid: ${got(uid)._2} vs $e")
    }
  }

  test("w8_rolling_median equals the driver-computed trailing median") {
    val got = graft.SparkEntry.queries("w8_rolling_median")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Double]("roll_median")).toMap

    val events = Tables(spark, dir, "events")
      .where(col("user_id") <= 50)
      .select("user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 14), i + 1)
          .map(_._4).sorted
        val m =
          if (frame.length % 2 == 1) frame(frame.length / 2)
          else (frame(frame.length / 2 - 1) + frame(frame.length / 2)) / 2.0
        (uid, ordered(i)._3) ->
          BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }

    assert(got.keySet === expected.keySet)
    for ((k, m) <- expected)
      assert(got(k) === m, s"(user, event) $k")
  }
}
