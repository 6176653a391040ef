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

  test("withPrefixSums equals the global running-sum window (two cols)") {
    val rows = (1 to 301).map(i => ((i * 7919) % 13, i.toLong,
      (i % 7).toLong, ((i * 3) % 5).toLong))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 5))
      .toDF("k", "id", "a", "b")
    val order = Seq(col("k"), col("id"))
    val got = Ranks.withPrefixSums(df, order, Seq("a", "b"))
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
    assert(got.select("k", "id", "a", "b", "cum_a", "cum_b")
      .except(expected).isEmpty)
    assert(expected
      .except(got.select("k", "id", "a", "b", "cum_a", "cum_b")).isEmpty)
    // last cumulative value is the column total
    assert(got.agg(max("cum_a")).head.getLong(0) ===
      rows.map(_._3).sum)
  }

  test("withPrefixSums: the plan's only window is pid-partitioned — " +
      "no single-partition exchange") {
    val rows = (1 to 64).map(i => ((i * 7919) % 13, i.toLong, 1L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 5))
      .toDF("k", "id", "a")
    val got = Ranks.withPrefixSums(df, Seq(col("k"), col("id")), Seq("a"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in plan:\n$plan")
    // the running-sum window must carry a partition spec (the pid)
    import org.apache.spark.sql.execution.window.WindowExec
    got.collect() // materialize through AQE
    val exec = got.queryExecution.executedPlan
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(q.plan)
      case w: WindowExec =>
        Seq(w) ++ w.children.flatMap(deep)
      case other => other.children.flatMap(deep)
    }
    val windows = deep(exec)
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"global window leaked into the scan primitive:\n$exec")
  }
}
