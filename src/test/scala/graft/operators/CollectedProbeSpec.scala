package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.GroupFilters
import graft.functions.bloom_probe_groups

/** The collected-broadcast probe (reference testers' shape:
  * `bloomfilters_tester.py:81` broadcasts the filter dict) must agree with
  * the join formulation row for row, and NULL out absent groups so callers
  * keep the inner-join skip semantics.
  */
class CollectedProbeSpec extends SparkSuite {
  import spark.implicits._

  private val p = 0.05
  private lazy val train =
    (0 until 4 * 2000).map(i => (s"train-$i", i % 4)).toDF("movieId", "rating")
  private lazy val probes =
    (0 until 4 * 2000).map(i => (s"probe-$i", i % 4)).toDF("movieId", "rating")

  test("fpStatsCollected == fpStats (join), group for group") {
    val filters = BloomPipeline.buildFilters(train, p)
    val joined = BloomPipeline.fpStats(probes, filters)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bc = spark.sparkContext.broadcast(BloomPipeline.collectFilters(filters))
    val collected = BloomPipeline.fpStatsCollected(probes, bc)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(collected === joined)
  }

  test("absent group probes NULL; present groups non-null (codegen + interpreted)") {
    val gf = GroupFilters(Seq((1, 64, 3, new Array[Byte](8))))
    val bc = spark.sparkContext.broadcast(gf)
    val df = Seq(("a", 1), ("b", 2)).toDF("movieId", "rating")
      .select(col("rating"), bloom_probe_groups(bc, col("rating"), col("movieId")).as("hit"))
    val rows = df.collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(rows(1) === false)
    assert(rows(2) === true, "group without a filter must probe NULL")
    // empty filter: every probe of a present group is a definite miss
    val hit = df.where(col("rating") === 1).select("hit").head().getBoolean(0)
    assert(hit === false)
  }

  test("GroupFilters rejects duplicate groups; binary search finds all") {
    intercept[IllegalArgumentException] {
      GroupFilters(Seq((1, 8, 1, new Array[Byte](1)), (1, 8, 1, new Array[Byte](1))))
    }
    val gf = GroupFilters(Seq(
      (5, 8, 1, new Array[Byte](1)), (1, 8, 1, new Array[Byte](1)),
      (3, 8, 1, new Array[Byte](1))))
    assert(Seq(1, 3, 5).forall(g => gf.indexOf(g) >= 0))
    assert(gf.indexOf(2) < 0 && gf.indexOf(9) < 0)
  }

  test("zero false negatives through the collected probe") {
    val bc = BloomPipeline.broadcastFilters(train, p)
    val misses = train
      .select(bloom_probe_groups(bc, col("rating"), col("movieId")).as("hit"))
      .where(!col("hit"))
      .count()
    assert(misses === 0L)
  }
}
