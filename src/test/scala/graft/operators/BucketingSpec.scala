package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed join: no exchange on either side, identical results") {
    val facts = (1 to 5000).map(i => (i.toLong % 100, s"f$i")).toDF("key", "payload")
    val dims = (0L until 100L).map(k => (k, s"dim$k")).toDF("key", "attr")

    val ft = Bucketing.ensureBucketed(spark, facts, "bspec_facts", "key")
    val dt = Bucketing.ensureBucketed(spark, dims, "bspec_dims", "key")

    // force the join path (no broadcast) to show bucketing removes the
    // shuffle that a plain sort-merge join would need
    val joined = spark.table(ft).hint("merge")
      .join(spark.table(dt).hint("merge"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, got:\n$plan")

    val got = joined.groupBy("key").count().as[(Long, Long)].collect().toMap
    val expected = facts.join(dims, "key").groupBy("key").count()
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }
}
