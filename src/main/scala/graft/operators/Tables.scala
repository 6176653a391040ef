package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the synthetic star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects unless
    // read as raw nanos-since-epoch longs; callers convert with
    // timestamp_micros(ts DIV 1000) when they need event time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
