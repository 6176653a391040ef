package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Schema-drift guard: the driver regenerates /root/testdata between
  * rounds, and a storage-representation change (events.ts went
  * TIMESTAMP(NANOS) -> timestamp[us] in r6) must surface as ONE failing
  * assertion naming the table, not as 14 cryptic analysis errors deep in
  * the event-time lane. Pins the POST-normalization schema every query
  * consumes — `Tables` owns the storage-to-contract adaptation.
  */
class TablesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is the CONTRACT type (nanos-since-epoch long), whatever the
    // parquet stores — the normalization under test
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  for (name <- Tables.names) {
    test(s"$name: normalized schema matches the engine contract") {
      val got = Tables(spark, dir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(got == want,
        s"\ntestdata drift for table '$name' (post-Tables schema):" +
          s"\n  got:  $got\n  want: $want" +
          "\nIf the driver changed the storage representation, extend " +
          "Tables.normalizeEvents (or this contract) in ONE place.")
    }
  }

  test("events.ts normalization is exact nanos, micros-grain, 2024-range") {
    val first = Tables(spark, dir, "events")
      .orderBy("event_id").select("ts").head.getLong(0)
    assert(first % 1000 == 0, "micros-precision storage -> nanos multiple of 1000")
    assert(first >= 1704067200L * 1000000000L &&
      first < 1735689600L * 1000000000L, s"ts=$first outside 2024 range")
  }
}
