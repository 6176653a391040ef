package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.BloomFilter
import graft.functions.{bloom_build, bloom_might_contain}

/** The reference's 4-stage pipeline (SURVEY.md §0) re-expressed as three
  * composable DataFrame functions (the split lives in [[Ratings]]):
  *
  * {{{
  * ratings --(linecount)--> (rating, n)                     // sizing stats
  * train + sizes --(buildFilters)--> (rating, n, m, k, bits)
  * test + filters --(fpStats)--> (rating, falsePositives, total, fpRate)
  * }}}
  *
  * Scale design: the sizing pass is a partial+final hash aggregate (tiny
  * result: one row per group); geometry joins back to the fact rows via
  * broadcast (no shuffle of the big side); the build is one shuffle of
  * pre-merged m-bit buffers; the probe broadcasts the filters (a few rows)
  * and keeps the predicate inside codegen; the final stats are another
  * partial+final aggregate. Total: exactly two shuffles of small data at
  * any input scale.
  */
object BloomPipeline {

  /** Stage 1 — reference job `count-number-of-keys.py:33-38` (A1). */
  def linecount(ratings: DataFrame): DataFrame =
    ratings.groupBy("rating").agg(count("*").as("n"))

  /** Per-group geometry from counts: m = ceil(-n ln p / ln^2 2), constant
    * k = ceil(-ln p / ln 2) — identical arithmetic to
    * [[graft.core.BloomFilter.numBits]] so driver-side and SQL-side sizing
    * agree bit-for-bit, including the Int.MaxValue-8 upper clamp (without
    * it the cast overflows under ANSI for groups of ~>496M keys at p=0.05;
    * groups that large should use [[shardedFilters]] instead, which has no
    * per-slab limit). */
  def sized(counts: DataFrame, p: Double): DataFrame = {
    val bitsPerKey = -math.log(p) / (math.log(2) * math.log(2))
    counts
      .withColumn("m",
        least(lit(Int.MaxValue.toLong - 8),
          greatest(lit(1L), ceil(col("n") * bitsPerKey))).cast("int"))
      .withColumn("k", lit(BloomFilter.numHashes(p)))
  }

  /** Stage 2 — reference builder (`bloomfilters_builder.py:87-100`,
    * `builder/BloomFilterReducer.java:46-94`). Output one row per group:
    * (rating, n, m, k, bits).
    */
  def buildFilters(train: DataFrame, p: Double): DataFrame = {
    val geometry = sized(linecount(train), p)
    train
      .join(broadcast(geometry), "rating")
      .groupBy("rating", "n", "m", "k") // n/m/k functionally determined by rating
      .agg(bloom_build(col("movieId"), col("m"), col("k")).as("bits"))
  }

  /** Stage 3 — reference tester (`bloomfilters_tester.py:94-112`,
    * `tester/ReducerTester.java:49-118`): probe each test row against its
    * group's filter, count false positives. Because train/test keys are
    * disjoint, every hit is a false positive (SURVEY.md §5.1).
    *
    * Edge policy (SURVEY.md §2.6, deliberate fix): a test rating with no
    * built filter is *skipped* via the inner join (the Hadoop engine
    * logged-and-dropped; the reference Spark engine crashed).
    */
  def fpStats(test: DataFrame, filters: DataFrame): DataFrame =
    test
      .join(broadcast(filters.select("rating", "m", "k", "bits")), "rating")
      .select(col("rating"),
        bloom_might_contain(col("bits"), col("m"), col("k"), col("movieId")).as("hit"))
      .groupBy("rating")
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("falsePositives"),
        count("*").as("total"))
      .withColumn("fpRate", col("falsePositives") / col("total"))

  /** Flagship: full build -> probe round trip (SURVEY.md §7.5). */
  def endToEnd(train: DataFrame, test: DataFrame, p: Double): DataFrame =
    fpStats(test, buildFilters(train, p))
}
