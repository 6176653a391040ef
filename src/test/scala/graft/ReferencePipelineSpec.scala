package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

/** End-to-end run of the reference's 4-job workflow on a synthetic IMDb
  * ratings TSV, asserting the FP-table contract. */
class ReferencePipelineSpec extends SparkSuite {

  test("4-job lifecycle: split -> linecount -> build+persist -> reload+probe") {
    val rnd = new scala.util.Random(11)
    val lines = "movieId\taverageRating\tnumVotes" +:
      (1 to 20000).map { i =>
        val rating = 1 + rnd.nextInt(10) // 1..10 like IMDb rounded
        f"tt$i%07d\t$rating%d.0\t${1 + rnd.nextInt(5000)}"
      } :+ "ttBROKEN\tnot_a_number\t3"
    val tsvDir = Files.createTempDirectory("graft_refpipe_tsv")
    Files.write(tsvDir.resolve("ratings.tsv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val outDir = Files.createTempDirectory("graft_refpipe_out").toString

    val p = 0.1
    val report = ReferencePipeline.run(spark, tsvDir.toString, p, outDir)

    assert(report.head.contains("ingested=20001"))
    assert(report.head.contains("corrupt_dropped=1"))
    val rows = report.drop(2).map(_.split("\t"))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (fp, total, rate) = (r(1).toLong, r(2).toLong, r(3).toDouble)
      assert(total > 0)
      assert(fp <= total)
      // disjoint split + integer ratings: probes of the SAME rating value
      // exist in train, so they all hit (same key space) — here movieIds
      // are unique, so observed rate is a genuine FP rate near p
      assert(rate < 4 * p, s"rating ${r(0)}: fpRate $rate")
    }

    // artifacts exist: single-file linecount text, filter parquet, results
    assert(Files.list(java.nio.file.Paths.get(s"$outDir/linecount"))
      .iterator().hasNext)
    assert(spark.read.parquet(s"$outDir/filters").count() === rows.length.toLong)
    val results = spark.read.text(s"$outDir/results").count()
    assert(results === rows.length.toLong)
  }
}
