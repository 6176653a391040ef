package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The staging recipe ([[Staging]], VERDICT r13 ask #5): semantics are
  * identity, and the two plan properties the helper exists for — the
  * spread widens a split-bound scan and the pin defeats CollapseProject —
  * are asserted on the physical plan, so the fourth wide-transform lane
  * cannot silently reintroduce the measured 21–400× collapse bugs. */
class StagingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (0 until 200)
    .map(i => (i.toLong, ("abcdefgh" * 16).drop(i % 8)))
    .toDF("doc_id", "text")

  test("stagedTransform is the identity on rows") {
    val px = transform(sequence(lit(1), lit(8)),
      i => ascii(col("text").substr(i, lit(1))).cast("long"))
    val total = aggregate(col("px"), lit(0L), (a, x) => a + x)
    val staged = Staging.stagedTransform(docs)(
      _.select(col("doc_id"), px.as("px")),
      _.select(col("doc_id"), total.as("s")))
    val plain = docs.select(col("doc_id"), px.as("px"))
      .select(col("doc_id"), total.as("s"))
    assert(staged.orderBy("doc_id").collect().toSeq ===
      plain.orderBy("doc_id").collect().toSeq)
  }

  test("pin is a CollapseProject barrier: producing projection survives") {
    // the mm8/mm9 failure shape exactly: the array column is referenced
    // ONCE, inside a fold lambda — CollapseProject inlines a
    // single-reference alias, planting the whole decode expression INSIDE
    // the lambda body, where it re-runs once per fold step (63×64 steps
    // in mm8 — the measured 424s plan)
    val src = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("abcdefgh" * 8), col("id").cast("string")).as("text"))
    val px = transform(sequence(lit(1), lit(8)),
      i => ascii(col("text").substr(i, lit(1))).cast("long"))
    val fold = aggregate(sequence(lit(1), lit(8)), lit(0L),
      (acc, i) => acc + element_at(col("px"), i.cast("int")))
    val collapsed = src.select(col("doc_id"), px.as("px"))
      .select(col("doc_id"), fold.as("s"))
    val substrRefsCollapsed = "substr".r.findAllIn(
      collapsed.queryExecution.optimizedPlan.toString).size
    assert(substrRefsCollapsed >= 1,
      "expected the un-pinned plan to inline the decode into the lambda")
    val staged = Staging.stagedTransform(src)(
      _.select(col("doc_id"), px.as("px")),
      _.select(col("doc_id"), fold.as("s")))
    // past the pin, px is a PHYSICAL column: no decode in the fold's plan
    val substrRefsStaged = "substr".r.findAllIn(
      staged.queryExecution.optimizedPlan.toString).size
    assert(substrRefsStaged === 0,
      "pin failed: decode leaked past the stage boundary")
    // and the staged rows equal the collapsed rows
    assert(staged.orderBy("doc_id").collect().toSeq ===
      collapsed.orderBy("doc_id").collect().toSeq)
  }

  test("spread widens a split-bound source to the shuffle width") {
    val one = docs.coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val spreadN = Staging.spread(one).rdd.getNumPartitions
    assert(spreadN ===
      spark.sessionState.conf.numShufflePartitions)
  }
}
