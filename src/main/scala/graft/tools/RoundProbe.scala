package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the modularity trajectory (whose rows expose the LP
  * fixed-point round directly — frozen trailing rounds repeat the fixed
  * round's integers) for one or more data dirs. SCALING.md's LP-convergence
  * evidence (VERDICT r16 ask #9) comes from this tool.
  *
  * Usage: `runMain graft.tools.RoundProbe <dir> [<dir> ...]`
  */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      println(s"== modularity trajectory @ $dir ==")
      graft.operators.Graph
        .modularity(graft.operators.Tables(spark, dir, "events"))
        .show(16, false)
      spark.catalog.clearCache()
    }
    graft.CleanExit.teardown(spark)
    graft.CleanExit.halt(0)
  }
}
