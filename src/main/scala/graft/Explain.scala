package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: print the formatted physical plan (and optionally
  * time the noop-sink execution) of registered queries.
  *
  * Usage: `runMain graft.Explain <sfDir> [queryName ...]`
  * (no names → all queries; set GRAFT_EXPLAIN_TIME=1 to also execute).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val time = sys.env.get("GRAFT_EXPLAIN_TIME").contains("1")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name =====")
      df.explain("formatted")
      if (time) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
