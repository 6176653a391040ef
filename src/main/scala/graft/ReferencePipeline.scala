package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BloomPipeline, FilterStore, Ingest, Ratings}

/** The reference's complete 4-job workflow as one program — what a user of
  * `map-reduce-bloom-filter` actually runs today (`sh-scripts/0..3`),
  * re-expressed end to end:
  *
  *   0. split: ratings TSV → train/test (60/40, seeded)
  *   1. linecount: per-rating counts → single text file (getmerge analog)
  *   2. builder: per-rating Bloom filters → persisted artifact
  *   3. tester: reload artifact, probe held-out split → per-rating FP table
  *
  * Usage: `runMain graft.ReferencePipeline <ratings.tsv dir> <p> <outDir>`
  * Prints the per-rating FP-rate table (the reference report's §6 shape)
  * and writes linecount text, the filter parquet artifact, and the results
  * text under `outDir`.
  */
object ReferencePipeline {

  def main(args: Array[String]): Unit = {
    val Array(tsvDir, pStr, outDir) = args
    val p = pStr.toDouble
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, tsvDir, p, outDir).foreach(println)
    finally spark.stop()
  }

  /** Returns the printed report lines (so tests can assert on them). */
  def run(spark: SparkSession, tsvDir: String, p: Double, outDir: String): Seq[String] = {
    // job 0 — ingest + split (reference split-dataset.py; seeded for rerun
    // stability, disjointness by row identity)
    val obs = new Observation(s"ingest_${System.identityHashCode(spark)}_${outDir.hashCode}")
    val ratings = Ingest.readRatingsTsvObserved(spark, tsvDir, obs)
    val Array(train, test) = Ratings.randomSplit(ratings, seed = 42L)

    // job 1 — linecount, merged to one text file (reference 1_launch +
    // getmerge): "rating\tcount" lines
    val counts = BloomPipeline.linecount(train)
    counts
      .select(format_string("%d\t%d", col("rating"), col("n")).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$outDir/linecount")

    // job 2 — build + persist the filter artifact
    FilterStore.save(BloomPipeline.buildFilters(train, p), s"$outDir/filters")

    // job 3 — reload + probe the held-out split; train/test disjoint, so
    // every hit is a false positive (reference §5.1 contract)
    val stats = BloomPipeline
      .fpStats(test, FilterStore.load(spark, s"$outDir/filters"))
      .orderBy("rating")
      .collect()
    BloomPipeline
      .fpStats(test, FilterStore.load(spark, s"$outDir/filters"))
      .select(format_string("%d\t%d\t%d\t%.8f",
        col("rating"), col("falsePositives"), col("total"), col("fpRate")).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$outDir/results")

    val header = Seq(
      f"ingested=${obs.get("total_rows")} corrupt_dropped=${obs.get("corrupt_rows")} p=$p%.4f",
      "rating\tfalsePositives\ttotal\tfpRate")
    header ++ stats.map { r =>
      f"${r.getInt(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getDouble(3)}%.8f"
    }
  }
}
