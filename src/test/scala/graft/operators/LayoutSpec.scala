package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits: known Morton vectors") {
    // x occupies even bit positions, y odd: morton(3,0)=0b0101=5,
    // morton(0,3)=0b1010=10; the rest checked against an independent
    // scalar implementation of the same construction
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((3L, 0L), (0L, 3L), (3L, 3L), (5L, 2L), (255L, 1L), (0L, 0L))
    val got = cases.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8)).as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => morton(x, y, 8) })
    assert(morton(3L, 0L, 8) === 5L && morton(0L, 3L, 8) === 10L)
  }

  test("zorderManifest: covers all rows; files tight in BOTH dimensions") {
    // a 32x32 grid: a linear sort on l_orderkey gives per-file l_partkey
    // ranges spanning the full domain; the z-order layout must cut the
    // summed partkey span by a wide margin — that span is exactly what a
    // min/max-pruned scan on l_partkey pays per file.
    val grid = for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong, 1L)
    val li = grid.toDF("l_orderkey", "l_partkey", "l_linenumber")
    val manifest = Layout.zorderManifest(li, nFiles = 16, bits = 5).cache()
    assert(manifest.agg(sum("n_rows")).as[Long].head() === 1024L)
    assert(manifest.count() === 16L)
    val zSpan = manifest
      .agg(sum(col("max_partkey") - col("min_partkey"))).as[Long].head()
    val wLinear = Window.orderBy("l_orderkey", "l_linenumber")
    val linSpan = li.withColumn("file_id", ntile(16).over(wLinear))
      .groupBy("file_id")
      .agg((max("l_partkey") - min("l_partkey")).as("span"))
      .agg(sum("span")).as[Long].head()
    manifest.unpersist()
    // 16 files of a 32x32 grid: z-order files are 8x8 blocks (span 7·16 +
    // boundary slack); linear files span the full 0..31 partkey range
    assert(linSpan === 31L * 16)
    assert(zSpan < linSpan / 2, s"z-order span $zSpan vs linear $linSpan")
  }
}
