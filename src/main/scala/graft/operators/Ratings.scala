package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ratings-analog views over the synthetic tables (FIXTURES.md §B): the
  * reference's data model is `(movieId STRING, rating 1..10)` rows parsed
  * from IMDb TSV (reference `spark-bloom-filter/bloomfilters_util.py:96-98`,
  * `builder/BloomFilterMapper.java:70-84`); we derive the same shape from
  * `lineitem` and `events` so every pipeline stage is checkable against a
  * SQL oracle on shared parquet.
  */
object Ratings {

  /** P1 parse-project analog: key + round-half-up integer rating 1..10.
    * Rounding parity with the reference (`floor(x + 0.5)`, SURVEY.md §1.4).
    * Catalyst prunes the scan to the three referenced columns.
    */
  def fromLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_quantity") >= 2.5)
      .select(
        concat(lit("it"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("movieId"),
        floor(col("l_quantity") / 5.0 + 0.5).cast("int").as("rating"))

  /** Same SQL for the DuckDB oracle. */
  val fromLineitemSql: String =
    """SELECT concat('it', l_orderkey, '-', l_linenumber) AS movieId,
      |       CAST(floor(l_quantity / 5.0 + 0.5) AS INT) AS rating
      |FROM lineitem WHERE l_quantity >= 2.5""".stripMargin

  /** Secondary source (FIXTURES.md §B2): events with clamped rating. */
  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id").cast("string").as("movieId"),
        least(lit(10), greatest(lit(1), floor(col("value") + 0.5).cast("int"))).as("rating"))

  val fromEventsSql: String =
    """SELECT CAST(event_id AS VARCHAR) AS movieId,
      |       least(10, greatest(1, CAST(floor(value + 0.5) AS INT))) AS rating
      |FROM events""".stripMargin

  /** Deterministic 60/40 split (replaces the reference's `randomSplit`,
    * `util/split-dataset.py:36`, which is seed-stable only within one
    * engine). The predicate is integer arithmetic so DuckDB computes the
    * identical partition — the split itself is oracle-checkable.
    * Disjointness of movieIds between the splits holds because movieId is
    * unique per row.
    */
  def splitBucket: org.apache.spark.sql.Column =
    (col("l_orderkey") * 7 + col("l_linenumber")) % 10

  /** The train-split parse over ANY lineitem-shaped relation (batch table
    * or stream) — single definition so the batch and streaming sides of a
    * probe can never desynchronize on the split/rating arithmetic. */
  def trainProjection(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_quantity") >= 2.5 && splitBucket < 6)
      .select(
        concat(lit("it"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("movieId"),
        floor(col("l_quantity") / 5.0 + 0.5).cast("int").as("rating"))

  def trainFromLineitem(spark: SparkSession, dir: String): DataFrame =
    trainProjection(Tables(spark, dir, "lineitem"))

  def testFromLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_quantity") >= 2.5 && splitBucket >= 6)
      .select(
        concat(lit("it"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("movieId"),
        floor(col("l_quantity") / 5.0 + 0.5).cast("int").as("rating"))

  def splitSql(cmp: String): String =
    s"""SELECT concat('it', l_orderkey, '-', l_linenumber) AS movieId,
       |       CAST(floor(l_quantity / 5.0 + 0.5) AS INT) AS rating
       |FROM lineitem
       |WHERE l_quantity >= 2.5 AND (l_orderkey * 7 + l_linenumber) % 10 $cmp 6""".stripMargin

  /** Reference-parity Bernoulli split (P8, `randomSplit([0.6, 0.4])`) —
    * kept for API completeness; not oracle-checkable across engines. */
  def randomSplit(df: DataFrame, seed: Long = 42L): Array[DataFrame] =
    df.randomSplit(Array(0.6, 0.4), seed)
}
