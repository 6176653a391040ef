package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranks]] must be bit-identical to the single-partition window forms
  * it replaces (r8 verdict ask #2), on every shape that matters: unique
  * keys, duplicate sort prefixes with tie-breaks, bucket counts that
  * divide / don't divide / exceed the row count — and its plan must
  * contain no window at all. */
class RanksSpec extends SparkSuite {
  import spark.implicits._

  // shuffled input with duplicate `k` (the sort prefix) and a unique
  // tie-break `id`, spread over several partitions
  private def sample(n: Int) = {
    val rows = (1 to n).map(i => ((i * 7919) % 13, i.toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 5))
      .toDF("k", "id")
  }

  test("withGlobalRank equals row_number over the global window") {
    val df = sample(501)
    val order = Seq(col("k"), col("id"))
    val (ranked, total) = Ranks.withGlobalRank(df, order, "rnk")
    assert(total === 501L)
    val expected = df.withColumn("rnk",
      row_number().over(Window.orderBy(order: _*)).cast("bigint"))
    assert(ranked.select("k", "id", "rnk").except(expected).isEmpty)
    assert(expected.except(ranked.select("k", "id", "rnk")).isEmpty)
  }

  test("withGlobalRank: descending order with tie-break") {
    val df = sample(97)
    val order = Seq(desc("k"), col("id"))
    val (ranked, _) = Ranks.withGlobalRank(df, order, "rnk")
    val expected = df.withColumn("rnk",
      row_number().over(Window.orderBy(order: _*)).cast("bigint"))
    assert(ranked.select("k", "id", "rnk").except(expected).isEmpty)
    assert(expected.except(ranked.select("k", "id", "rnk")).isEmpty)
  }

  test("withGlobalNtile equals ntile for dividing/non-dividing/oversized n") {
    val df = sample(100)
    val order = Seq(col("k"), col("id"))
    for (n <- Seq(4, 7, 16, 100, 250)) {
      val got = Ranks.withGlobalNtile(df, order, n, "tile")
      val expected = df.withColumn("tile",
        ntile(n).over(Window.orderBy(order: _*)).cast("bigint"))
      assert(got.select("k", "id", "tile").except(expected).isEmpty,
        s"ntile($n) diverged")
      assert(expected.except(got.select("k", "id", "tile")).isEmpty,
        s"ntile($n) diverged (missing rows)")
    }
  }

  test("empty input ranks to empty, total 0") {
    val df = Seq.empty[(Int, Long)].toDF("k", "id")
    val (ranked, total) = Ranks.withGlobalRank(df, Seq(col("k"), col("id")), "rnk")
    assert(total === 0L)
    assert(ranked.count() === 0L)
  }

  test("the ranked plan contains no window and no single-partition exchange") {
    val df = sample(64)
    val (ranked, _) = Ranks.withGlobalRank(df, Seq(col("k"), col("id")), "rnk")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in plan:\n$plan")
  }
}
