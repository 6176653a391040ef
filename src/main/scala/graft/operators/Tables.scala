package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the synthetic star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects unless
    // read as raw nanos-since-epoch longs; the session builders (Bench,
    // Verify, test suites) set spark.sql.legacy.parquet.nanosAsLong=true.
    // Fail fast with a pointer rather than mutating shared session conf
    // from inside a read-only accessor.
    if (name == "events" &&
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true")) {
      throw new IllegalStateException(
        "reading events.parquet (TIMESTAMP_NANOS) requires " +
          "spark.sql.legacy.parquet.nanosAsLong=true on the session builder")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
