package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity TSV ingest (S1): the IMDb ratings file shape
  * `(movieId, averageRating, numVotes)` with a header row (reference
  * `util/split-dataset.py:29-33`, `bloomfilters_util.py:96-98`).
  *
  * Malformed-row policy (SURVEY.md §2.6 decision): PERMISSIVE parse →
  * unparseable fields become null → dropped, with the dropped count
  * observable via [[readRatingsTsvWithCorrupt]]. (The Hadoop reference
  * logged-and-skipped; the Python reference crashed.)
  */
object Ingest {

  val ratingsSchema: StructType = StructType(Seq(
    StructField("movieId", StringType, nullable = true),
    StructField("averageRating", DoubleType, nullable = true),
    StructField("numVotes", IntegerType, nullable = true)))

  /** Clean rows only: movieId + round-half-up integer rating. */
  def readRatingsTsv(spark: SparkSession, path: String): DataFrame =
    readRatingsTsvWithCorrupt(spark, path)
      .where(col("movieId").isNotNull && col("averageRating").isNotNull)
      .select(
        col("movieId"),
        floor(col("averageRating") + 0.5).cast("int").as("rating"))

  /** Full parse including nulls for malformed fields, for callers that
    * want the drop-with-metric accounting. */
  def readRatingsTsvWithCorrupt(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(ratingsSchema)
      .csv(path)

  /** Drop-with-metric done the idiomatic Spark way: clean rows come back,
    * and the dropped-row count rides the SAME job as an observed metric
    * (`Observation.get("corrupt_rows")`) — no second pass, no
    * accumulator races (observe metrics are exactly-once per action,
    * unlike accumulators under task retries). This is the §2.6 policy the
    * Hadoop reference approximated with log-and-skip counters. */
  def readRatingsTsvObserved(
      spark: SparkSession, path: String,
      observation: org.apache.spark.sql.Observation): DataFrame = {
    val corrupt = col("movieId").isNull || col("averageRating").isNull
    readRatingsTsvWithCorrupt(spark, path)
      .observe(observation,
        sum(when(corrupt, 1L).otherwise(0L)).as("corrupt_rows"),
        count(lit(1)).as("total_rows"))
      .where(!corrupt)
      .select(
        col("movieId"),
        floor(col("averageRating") + 0.5).cast("int").as("rating"))
  }

  /** The same §2.6 drop-with-metric policy for the JSONL corpus format:
    * PERMISSIVE parse routes unparseable lines to `_corrupt_record`
    * (fields null), the corrupt count rides the SAME job as an observed
    * metric, clean rows come back typed. The corrupt column must be in
    * the explicit read schema — Spark only materializes it on request —
    * and the filter references the data columns alongside it, which is
    * what keeps the "corrupt-column-only query" restriction away.
    *
    * Metric-consumer caveat (applies to [[readRatingsTsvObserved]]
    * too): run the action BEFORE any global sort of this result — a
    * sort's range-partition sampling pass re-executes the observe
    * subtree, so the metrics double. Sorting downstream of a shuffle
    * boundary (or driver-side) leaves them exactly-once. */
  val docsJsonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  def readDocsJsonObserved(
      spark: SparkSession, path: String,
      observation: org.apache.spark.sql.Observation): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .schema(docsJsonSchema)
      .json(path)
      .observe(observation,
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("corrupt_rows"),
        count(lit(1)).as("total_rows"))
      .where(col("_corrupt_record").isNull)
      .select("doc_id", "lang", "n_chars")
}
