package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — `left.value BETWEEN right.lo AND right.hi` —
  * without the nested-loop plan Spark falls back to for pure inequality
  * joins. The standard bin-bucketing rewrite:
  *
  *   1. pick a bin width `w`; every left row lives in exactly ONE bin
  *      (`floor(value / w)`), every right interval explodes to the bins
  *      it overlaps (`floor(lo/w) .. floor(hi/w)` — bounded by
  *      `span/w + 2` rows per interval);
  *   2. equi-join on the bin — a plain shuffle-partitionable hash join;
  *   3. re-check the exact BETWEEN predicate (bin overlap is a superset).
  *
  * Each (row, interval) pair meets at most once (the row's single bin),
  * so no dedup pass is needed. Cost shape: shuffle on bin instead of an
  * O(|L|·|R|) loop; bin width trades right-side replication against
  * candidate false positives — set it near the typical interval span.
  */
object RangeJoin {

  /** `left` (with numeric `valueCol`) joined to `right` intervals
    * (`loCol`..`hiCol`, inclusive). Columns of both inputs survive. */
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lb = left.withColumn("__bin", floor(col(valueCol) / binWidth))
    val rb = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    lb.join(rb, "__bin")
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
