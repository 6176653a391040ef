package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout clustering — the table-maintenance side of scan pruning.
  *
  * [[zorderManifest]] is the planning face of multi-dimensional
  * clustering (Delta/Iceberg `OPTIMIZE ZORDER BY`): rows are ordered
  * along a Morton (z-order) curve over two dimensions and cut into
  * target files, so per-file min/max ranges are tight in BOTH
  * dimensions and a predicate on either column can skip most files —
  * a linear sort gives tight ranges in the sort column only. Parquet
  * row-group pruning over such a layout is what `k6_rowgroup_pruning`
  * measures; this operator produces the layout plan itself.
  *
  * Both dimensions are rank-bucketed (`ntile`) before bit interleaving —
  * the standard range-id construction, immune to skew and to value
  * ranges wider than the bit budget. Everything is built from integer
  * window + bit arithmetic, so the manifest is oracle-exact in
  * [[LayoutSql.zorderManifest]].
  *
  * Scale shape: the registered query uses exact `ntile` windows (one
  * global sort per dimension and one along the curve) because exactness
  * is what makes it twin-checkable; the 100 TB write path swaps the
  * final window for `repartitionByRange(zval)` +
  * `sortWithinPartitions(zval)` + write, and the per-dimension rank for
  * the sampled range-id Delta uses — the curve and the manifest shape
  * are unchanged.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative long
    * columns: x occupies even bit positions, y odd. A fold of codegen'd
    * shift/mask builtins — no UDF. */
  def zValue(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(bx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(by, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order layout manifest for `lineitem` over `(l_orderkey,
    * l_partkey)`: `(file_id, n_rows, min_orderkey, max_orderkey,
    * min_partkey, max_partkey)`, one row per target file. Deterministic
    * end to end: every `ntile` window carries the full
    * `(l_orderkey, l_linenumber)` tie-break. */
  def zorderManifest(lineitem: DataFrame, nFiles: Int = 16, bits: Int = 8): DataFrame = {
    val buckets = 1 << bits
    val tie = Seq(col("l_orderkey"), col("l_linenumber"))
    val wx = Window.orderBy(col("l_orderkey") +: col("l_linenumber") +: Nil: _*)
    val wy = Window.orderBy(col("l_partkey") +: tie: _*)
    val bucketed = lineitem
      .select(col("l_orderkey").cast("bigint").as("l_orderkey"),
        col("l_partkey").cast("bigint").as("l_partkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"))
      .withColumn("bx", ntile(buckets).over(wx).cast("bigint") - 1)
      .withColumn("by", ntile(buckets).over(wy).cast("bigint") - 1)
      .withColumn("zval", zValue(col("bx"), col("by"), bits))
    val wz = Window.orderBy(col("zval") +: tie: _*)
    bucketed
      .withColumn("file_id", ntile(nFiles).over(wz).cast("bigint"))
      .groupBy("file_id")
      .agg(count("*").as("n_rows"),
        min("l_orderkey").as("min_orderkey"),
        max("l_orderkey").as("max_orderkey"),
        min("l_partkey").as("min_partkey"),
        max("l_partkey").as("max_partkey"))
  }
}

object LayoutSql {

  private def interleaveSql(bx: String, by: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($bx >> $i) & 1) << ${2 * i}) | ((($by >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** Twin of [[Layout.zorderManifest]]: same rank buckets, same
    * interleave, same tie-breaks. */
  def zorderManifest(nFiles: Int, bits: Int): String = {
    val buckets = 1 << bits
    s"""SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |       min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
       |       min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey
       |FROM (
       |  SELECT l_orderkey, l_partkey,
       |         CAST(ntile($nFiles) OVER (ORDER BY zval, l_orderkey, l_linenumber)
       |              AS BIGINT) AS file_id
       |  FROM (
       |    SELECT l_orderkey, l_partkey, l_linenumber,
       |           ${interleaveSql("bx", "by", bits)} AS zval
       |    FROM (
       |      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       |             CAST(l_partkey AS BIGINT) AS l_partkey,
       |             CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |             CAST(ntile($buckets) OVER (ORDER BY l_orderkey, l_linenumber)
       |                  AS BIGINT) - 1 AS bx,
       |             CAST(ntile($buckets) OVER (ORDER BY l_partkey, l_orderkey,
       |                                        l_linenumber) AS BIGINT) - 1 AS by
       |      FROM lineitem)))
       |GROUP BY file_id ORDER BY file_id""".stripMargin
  }
}
