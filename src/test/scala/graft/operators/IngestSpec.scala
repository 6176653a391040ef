package graft.operators

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Reference-parity TSV ingest (S1) + the SURVEY §2.6 malformed-row
  * decision: PERMISSIVE parse, drop-with-metric. */
class IngestSpec extends SparkSuite {

  private def writeFixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_ingest")
    Files.write(dir.resolve("part-0.tsv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  private val fixture = Seq(
    "movieId\taverageRating\tnumVotes",
    "tt0000001\t5.7\t1882",     // clean
    "tt0000002\t6.0\t250",      // clean
    "tt0000003\t6.5\t98",       // clean, .5 rounds UP (half-up parity)
    "tt0000004\tnot_a_number\t5", // malformed rating -> dropped with metric
    "tt0000005\t7.2",           // missing column -> rating ok, votes null
    "\t\t",                     // all-empty row: skipped by the reader itself
    "tt0000007\t4.49\t12")      // rounds down

  test("clean rows parse with round-half-up ratings; malformed are dropped") {
    val path = writeFixture(fixture)
    val got = Ingest.readRatingsTsv(spark, path).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map(
      "tt0000001" -> 6, // 5.7 + .5 -> floor 6
      "tt0000002" -> 6,
      "tt0000003" -> 7, // 6.5 half rounds up, Java Math.round parity
      "tt0000005" -> 7, // 7.2 parses even with votes missing
      "tt0000007" -> 4))
  }

  test("drop-with-metric: the corrupt count is observable, not silent") {
    val path = writeFixture(fixture)
    val full = Ingest.readRatingsTsvWithCorrupt(spark, path)
    val dropped = full
      .where(col("movieId").isNull || col("averageRating").isNull)
      .count()
    assert(dropped === 1) // the not_a_number row (all-empty rows never
    assert(full.count() === 6) // even reach the parser — reader skips them)
  }

  test("observed drop-with-metric: corrupt count rides the same job") {
    val path = writeFixture(fixture)
    val obs = new org.apache.spark.sql.Observation("ingest")
    val clean = Ingest.readRatingsTsvObserved(spark, path, obs)
    assert(clean.count() === 5) // action triggers the observation
    assert(obs.get("corrupt_rows") === 1L)
    assert(obs.get("total_rows") === 6L)
  }

  test("JSONL corrupt-record lane: malformed lines dropped with metric") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_jsonl_dirty")
    val lines = Seq(
      """{"doc_id":1,"lang":"en","n_chars":10}""",
      """{"doc_id":2,"lang":"fr","n_chars":20""", // truncated -> corrupt
      """not json at all""",
      """{"doc_id":4,"lang":"de","n_chars":40}""")
    Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val obs = new org.apache.spark.sql.Observation("jsonl")
    val clean = Ingest.readDocsJsonObserved(spark, dir.toString, obs)
    // no orderBy before the action: a sort's range-partition sampling
    // pass re-executes the observe subtree and doubles the metrics
    // (see the reader's scaladoc) — sort driver-side instead
    val got = clean.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got === Array((1L, "en", 10L), (4L, "de", 40L)))
    assert(obs.get("corrupt_rows") === 2L)
    assert(obs.get("total_rows") === 4L)
  }

  test("reading a TSV written by the engine round-trips (S1+K1 parity)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ingest_rt").toString
    Seq(("m1", 4.2, 10), ("m2", 9.5, 3))
      .toDF("movieId", "averageRating", "numVotes")
      .write.mode("overwrite").option("sep", "\t").option("header", "true").csv(dir)
    val got = Ingest.readRatingsTsv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("m1" -> 4, "m2" -> 10))
  }

  test("zstd parquet is denser than uncompressed and reads back identically") {
    def dirSize(p: String): Long =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val base = Files.createTempDirectory("graft_zstd").toString
    docs.write.mode("overwrite").option("compression", "none")
      .parquet(s"$base/none")
    docs.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$base/zstd")
    assert(dirSize(s"$base/zstd") < dirSize(s"$base/none"),
      s"zstd ${dirSize(s"$base/zstd")} !< none ${dirSize(s"$base/none")}")
    val back = spark.read.parquet(s"$base/zstd").orderBy("doc_id").collect()
    assert(back.map(_.toSeq).toSeq ===
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }
}
