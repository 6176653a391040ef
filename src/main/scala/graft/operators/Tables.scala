package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table access for the synthetic star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** The engine-internal contract for `events.ts` is nanos-since-epoch
    * LONG — every event-time query (windows, sessionization, as-of joins,
    * watermark twins) does integer `div` arithmetic on it, and the DuckDB
    * oracles mirror it with `epoch_ns(ts)`. The testdata has shipped the
    * column as TIMESTAMP(NANOS) (read as raw longs), and currently as
    * parquet `timestamp[us]` (read as TIMESTAMP_NTZ) — normalize ALL of
    * them to the long contract at this one choke point instead of teaching
    * 14 queries about storage drift.
    *
    * The NTZ branch must NOT go through a session-timezone cast: DuckDB's
    * `epoch_ns` treats the stored wall time as UTC, so the Spark side uses
    * pure wall-clock arithmetic (`timestampdiff` between NTZ values),
    * which is identical under any `spark.sql.session.timeZone`.
    * Works on batch and streaming DataFrames alike (plain projection).
    */
  def normalizeEvents(df: DataFrame): DataFrame = {
    def tsToNanos: Column = df.schema("ts").dataType match {
      case LongType => col("ts")
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000")
      case TimestampType => expr("unix_micros(ts) * 1000")
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other - extend " +
          "Tables.normalizeEvents for this storage representation")
    }
    if (df.schema("ts").dataType == LongType) df
    else df.withColumn("ts", tsToNanos)
  }
}
