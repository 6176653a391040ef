package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.core.BloomFilter
import graft.streaming.StreamingBloom.{FilterState, KeyedRecord}

class StreamingBloomSpec extends SparkSuite {
  import spark.implicits._

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("incrementalFilters folds micro-batches into per-group state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val q = StreamingBloom.incrementalFilters(in.toDS(), capacityPerGroup = 1000, p = 0.05)
      .writeStream.format("memory").queryName("inc_filters")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((0 until 300).map(i => KeyedRecord(i % 2, s"b1-$i")): _*)
      drain(q)
      in.addData((0 until 300).map(i => KeyedRecord(i % 2, s"b2-$i")): _*)
      drain(q)

      // latest state per group: n = 300 inserts, and EVERY key from both
      // batches must probe positive (zero FN across batch boundaries)
      val latest = spark.table("inc_filters").as[FilterState].collect()
        .groupBy(_.group).map { case (g, states) => g -> states.maxBy(_.n) }
      assert(latest.keySet === Set(0, 1))
      latest.values.foreach { s =>
        assert(s.n === 300L)
        (0 until 300).foreach { i =>
          for (b <- Seq("b1", "b2")) {
            val key = s"$b-$i"
            if (i % 2 == s.group) {
              assert(BloomFilter.mightContainBytes(s.bits, s.m, s.k, key.getBytes),
                s"group ${s.group} lost $key")
            }
          }
        }
      }
    } finally q.stop()
  }

  test("firstSeenBloom emits each key once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val q = StreamingBloom.firstSeenBloom(in.toDS(), capacityPerGroup = 10000, p = 0.01)
      .writeStream.format("memory").queryName("first_seen")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(KeyedRecord(1, "a"), KeyedRecord(1, "b"), KeyedRecord(1, "a"))
      drain(q)
      in.addData(KeyedRecord(1, "b"), KeyedRecord(1, "c"), KeyedRecord(2, "a"))
      drain(q)
      val got = spark.table("first_seen").as[KeyedRecord].collect()
        .map(r => (r.group, r.key)).toSet
      // duplicates within AND across batches suppressed; groups independent
      assert(got === Set((1, "a"), (1, "b"), (1, "c"), (2, "a")))
    } finally q.stop()
  }

  test("firstSeenExact dedups with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Int, String)]
    val df = in.toDF().toDF("ts", "group", "key")
    val q = StreamingBloom.firstSeenExact(df, "ts", "1 hour")
      .writeStream.format("memory").queryName("first_exact")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      in.addData((t0, 1, "x"), (t0, 1, "x"), (t0, 1, "y"))
      drain(q)
      in.addData((Timestamp.valueOf("2026-01-01 10:30:00"), 1, "x"))
      drain(q)
      val got = spark.table("first_exact").collect().map(r => r.getString(2)).sorted
      assert(got.toSeq === Seq("x", "y"))
    } finally q.stop()
  }

  test("streamingProbe: stream-static join probes reloaded filters, zero FN") {
    implicit val sqlCtx = spark.sqlContext
    // static side: batch-built filters, round-tripped through parquet
    val train = (0 until 500).map(i => (s"key-$i", i % 2))
      .toDF("movieId", "rating")
    val path = java.nio.file.Files.createTempDirectory("graft_stream_filters").toString
    graft.operators.FilterStore.save(
      graft.operators.BloomPipeline.buildFilters(train, 0.05), path)
    val filters = graft.operators.FilterStore.load(spark, path)
      .withColumnRenamed("rating", "group")

    val in = MemoryStream[KeyedRecord]
    val q = StreamingBloom.streamingProbe(in.toDF(), filters)
      .writeStream.format("memory").queryName("probe_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        KeyedRecord(0, "key-0"), KeyedRecord(1, "key-1"),   // trained -> must hit
        KeyedRecord(0, "nope-a"), KeyedRecord(1, "nope-b")) // untrained
      drain(q)
      val got = spark.table("probe_out").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[Boolean]("hit")).toMap
      assert(got("key-0") && got("key-1"), "zero FN on the stream side")
      assert(got.size === 4)
    } finally q.stop()
  }

  test("append mode: watermark finalizes windows, late data is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Int, String)]
    val df = in.toDF().toDF("ts", "group", "key")
    val q = StreamingBloom.windowedLinecount(df, "ts", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_append")
      .outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.table("win_append")
        .selectExpr("date_format(window.start, 'HH:mm')", "group", "n").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

      in.addData(
        (Timestamp.valueOf("2026-01-01 10:05:00"), 1, "a"),
        (Timestamp.valueOf("2026-01-01 10:06:00"), 1, "b"))
      drain(q)
      assert(rows().isEmpty, "open window must not emit in append mode")

      // advance the watermark past the 10:00 window's close (+10 min delay)
      in.addData((Timestamp.valueOf("2026-01-01 12:00:00"), 1, "c"))
      drain(q)
      // the finalized window emits by the following batch at the latest
      in.addData((Timestamp.valueOf("2026-01-01 12:01:00"), 1, "d"))
      drain(q)
      assert(rows() === Set(("10:00", 1, 2L)), rows().toString)

      // an event behind the watermark must be dropped, not re-open 10:00
      in.addData((Timestamp.valueOf("2026-01-01 10:07:00"), 1, "late"))
      drain(q)
      in.addData((Timestamp.valueOf("2026-01-01 12:30:00"), 1, "e"))
      drain(q)
      assert(rows() === Set(("10:00", 1, 2L)),
        s"late event must not change finalized windows: ${rows()}")
    } finally q.stop()
  }

  test("windowedLinecount aggregates per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Int, String)]
    val df = in.toDF().toDF("ts", "group", "key")
    val q = StreamingBloom.windowedLinecount(df, "ts", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        (Timestamp.valueOf("2026-01-01 10:05:00"), 1, "a"),
        (Timestamp.valueOf("2026-01-01 10:45:00"), 1, "b"),
        (Timestamp.valueOf("2026-01-01 11:05:00"), 1, "c"),
        (Timestamp.valueOf("2026-01-01 10:05:00"), 2, "d"))
      drain(q)
      val got = spark.table("win_counts")
        .selectExpr("date_format(window.start, 'HH:mm')", "group", "n").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === Set(("10:00", 1, 2L), ("11:00", 1, 1L), ("10:00", 2, 1L)))
    } finally q.stop()
  }
}
