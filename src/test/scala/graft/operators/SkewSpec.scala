package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin: identical results to plain join, hot key spread over salts") {
    // one pathologically hot key (90% of the big side)
    val big = ((1 to 9000).map(i => (1L, s"row$i")) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, s"cold$i")))
      .toDF("orderkey", "payload")
    val small = (1L to 60L).map(k => (k, s"dim$k")).toDF("orderkey", "attr")

    val plain = big.join(small, "orderkey")
      .groupBy("orderkey").count().as[(Long, Long)].collect().toMap
    val salted = Skew.saltedJoin(big, small, "orderkey", 8, Seq("orderkey", "payload"))
      .groupBy("orderkey").count().as[(Long, Long)].collect().toMap
    assert(salted === plain)

    // the hot key's rows really spread across salt buckets
    val spread = big.where($"orderkey" === 1L)
      .withColumn("salt", pmod(xxhash64($"orderkey", $"payload"), lit(8L)))
      .select("salt").distinct().count()
    assert(spread === 8L)
  }
}
