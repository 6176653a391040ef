package graft.streaming

import graft.SparkSuite
import graft.operators.Tables

class StreamingQueriesSpec extends SparkSuite {

  test("eventHourly stream reproduces the batch answer exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.eventHourly(spark, dir).collect()
    assert(streamed.nonEmpty)

    import org.apache.spark.sql.functions._
    val batch = Tables(spark, dir, "events")
      .select(date_format(timestamp_micros(expr("ts div 1000")),
        "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
      .groupBy("hour", "event_type").agg(count("*").as("n"))
      .orderBy("hour", "event_type")
      .collect()

    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("dedupState stream matches the batch distinct count") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val row = StreamingQueries.dedupState(spark, dir).head()
    val batch = Tables(spark, dir, "documents")
      .agg(count("*"),
        countDistinct(graft.operators.TextAnalysis.normalized(col("text")))).head()
    assert(row.getLong(0) === batch.getLong(0))
    assert(row.getLong(1) === batch.getLong(1))
  }

  test("streamDropDuplicates collapses a doubled stream to the batch row set") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.streamDropDuplicates(spark, dir).collect()
    val batch = Tables(spark, dir, "events")
      .groupBy("event_type").agg(count("*").as("n"))
      .orderBy("event_type").collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("bloomProbe stream: zero false negatives -> hits == total per group") {
    val dir = "/root/testdata/sf0.001"
    val rows = StreamingQueries.bloomProbe(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("hits") === r.getAs[Long]("total"), r))
  }
}
