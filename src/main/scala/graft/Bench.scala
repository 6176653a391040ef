package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"ok":{...},"sf":...}`.
  *
  * Methodology (fixes the round-1 hole, VERDICT.md "What's wrong" #1/#6):
  *  - results go to the `noop` datasource, not `.count()` — a count lets
  *    Catalyst prune every unused projection/aggregate expression, so e.g.
  *    a bloom build benched as an empty aggregate. `noop` materializes
  *    every column of every row and discards them.
  *  - one warm-up pass over all queries at sf0.001 (~6k rows) so JIT /
  *    codegen compilation doesn't land on the first measured query.
  *  - a failing query contributes `ok=false` instead of silently
  *    contributing a fast time.
  */
object Bench {
  private val warmupDir = "/root/testdata/sf0.001"

  private def runOne(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): (Double, Boolean) = {
    // each query pays its own full cost: operators that persist shared
    // subtrees (bloom builds, dedup stages) must not hand a warm cache to
    // the next measured query
    spark.catalog.clearCache()
    // the sink queries leave hundreds of MB of dirty pages behind; the
    // kernel's deferred writeback otherwise lands as a ~10s stall INSIDE
    // one random later query's timing per run — flush here, untimed
    try new ProcessBuilder("sync").inheritIO().start().waitFor()
    catch { case _: Exception => }
    val t0 = System.nanoTime()
    val ok =
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        false
      }
    ((System.nanoTime() - t0) / 1e9, ok)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional local-iteration filter: bench only the named queries
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the status stores retain plan graphs/metrics per execution even
      // with the UI off; across 100+ measured queries that accrual becomes
      // late-run GC pressure that inflates the LAST queries' times — keep
      // the retention tiny, the bench never reads it back
      .config("spark.sql.ui.retainedExecutions", "5")
      // drained AvailableNow streams leave their state-store providers
      // loaded; the maintenance task's periodic snapshot/cleanup wave over
      // all of them steals cores from whatever query it lands on — push it
      // past the bench horizon (checkpoints here are throwaway)
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.sql.warehouse.dir", s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val selected0 = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Deterministic run order, streaming LAST: each drained stream leaves
    // per-session debris (state-store providers, memory sinks, listener
    // registrations) that measurably drags later CPU-saturating queries —
    // isolating the st* block at the end keeps every batch query's number
    // clean and makes ordering stable across rounds. (Map iteration order
    // would otherwise reshuffle with every added query.)
    val selected = selected0.toSeq.sortBy { case (n, _) =>
      (n.startsWith("st"), n)
    }

    if (new java.io.File(warmupDir).isDirectory) {
      selected.foreach { case (name, fn) =>
        runOne(spark, name, fn, warmupDir)
      }
    }
    // warm the target-SF files (untimed): the first touch of each table's
    // pages otherwise lands inside whichever measured query happens to
    // read that table first
    graft.operators.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Exception => }
    }

    val results = selected.map { case (name, fn) =>
      name -> runOne(spark, name, fn, sfDir)
    }
    val qs = results.map { case (k, (t, _)) => s"\"$k\":$t" }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, (_, ok)) => s"\"$k\":$ok" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"sf":"$sfDir"}"""

    // The driver keeps only the LAST ~2000 bytes of stdout and json-parses
    // line by line; the full-detail line above is ~5 KB and its head gets
    // truncated out of that window. Emit a compact final line that is
    // guaranteed to fit: times at 2 decimals, queries included slowest-first
    // until a 1900-byte budget is reached, the rest summarized as "omitted".
    val failed = results.collect { case (k, (_, false)) => s"\"$k\"" }
    val sorted = results.toSeq.sortBy { case (_, (t, _)) => -t }
      .map { case (k, (t, _)) => f""""$k":$t%.2f""" }
    val tailLen = s""","omitted":0,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""".length + 8
    val head = f"""{"metric":"total","value":$total%.2f,"unit":"sec","nq":${results.size},"queries":{"""
    val budget = 1900 - head.length - tailLen
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    sorted.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val compact = head + kept.mkString(",") +
      s"""},"omitted":${sorted.size - kept.size},"failed":[${failed.mkString(",")}],"sf":"$sfDir"}"""

    spark.stop()
    // Last two stdout lines, after spark.stop() so no executor log can
    // interleave: full detail (for human logs), then the parseable compact.
    println(full)
    println(compact)
    System.out.flush()
  }
}
