package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("asofJoin: inclusive latest-preceding match per key; null when none") {
    val probes = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L),   // t=5 precedes all quotes
      ("b", 15L, 4L))
      .toDF("k", "t", "probe_id")
    val quotes = Seq(
      ("a", 10L, 1.0), ("a", 18L, 2.0),                 // t=10 matches probe t=10 inclusively
      ("b", 1L, 9.0), ("b", 15L, 8.0))
      .toDF("k", "qt", "qv")

    val got = AsOf.asofJoin(probes, quotes, "k", "t", "qt", Seq("qt", "qv"))
      .select($"probe_id", $"asof.qt".as("qt"), $"asof.qv".as("qv"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

    assert(got === Map(
      1L -> Some((10L, 1.0)),   // equal time: quote visible (inclusive)
      2L -> Some((18L, 2.0)),   // latest preceding, not just any
      3L -> None,               // nothing at or before t=5
      4L -> Some((15L, 8.0)))) // inclusive at t=15, supersedes t=1
  }

  test("asofJoin: null right times match nothing") {
    val probes = Seq(("a", 10L, 1L)).toDF("k", "t", "probe_id")
    val quotes = Seq(("a", Option.empty[Long], 7.0)).toDF("k", "qt", "qv")
    val row = AsOf.asofJoin(probes, quotes, "k", "t", "qt", Seq("qt", "qv")).head()
    assert(row.getAs[Any]("asof") === null)
  }

  test("asofJoinTolerance: stale matches null out, fresh ones survive, " +
      "boundary is inclusive") {
    val probes = Seq(
      ("a", 20L, 1L), // quote at 18, gap 2  <= tol 5 → match
      ("a", 30L, 2L), // quote at 18, gap 12 >  tol 5 → stale, null
      ("a", 23L, 3L), // gap exactly 5 → inclusive, match
      ("b", 50L, 4L)) // no quote at all → null (same as plain asof)
      .toDF("k", "t", "probe_id")
    val quotes = Seq(("a", 18L, 2.0)).toDF("k", "qt", "qv")

    val got = AsOf.asofJoinTolerance(probes, quotes, "k", "t", "qt",
      Seq("qt", "qv"), tolerance = 5L)
      .select($"probe_id", $"asof.qt".as("qt"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got === Map(
      1L -> Some(18L),
      2L -> None,      // found but stale: nulled, not dropped
      3L -> Some(18L), // gap == tolerance is a match
      4L -> None))
  }
}
