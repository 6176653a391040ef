package graft.operators

import graft.SparkSuite

/** Unit coverage for [[TextAnalysis]] derivations whose corpus faces are
  * oracle-checked — these pin the semantics on hand-checkable inputs. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("vocabGrowth: first-seen accounting on a hand-checked corpus") {
    // bucket 0 = docs {0,1}: tokens a,b then a,c -> 3 new
    // bucket 1 = docs {2,3}: d d (1 new), a b (0 new)
    val d = Seq((0L, "a b"), (1L, "a c"), (2L, "d d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(d, nBuckets = 2).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs_cum"),
        r.getAs[Long]("new_tokens"), r.getAs[Long]("vocab")))
    assert(got === Array((0L, 2L, 3L, 3L), (1L, 4L, 1L, 4L)))
  }

  test("zipfSlope: recovers the exponent of an exact power-law corpus") {
    // token t_r appears round(64 / r^1.5) times for r = 1..8 — a corpus
    // whose head is (approximately, integer-rounded) freq ∝ rank^-1.5
    val freqs = (1 to 8).map(r => r -> math.round(64.0 / math.pow(r, 1.5)).toInt)
    val text = freqs.flatMap { case (r, n) => Seq.fill(n)(s"tok$r") }
      .mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(d, topK = 8).collect().head
    assert(row.getAs[Long]("n_used") === 8L)
    val slope = row.getAs[Double]("slope")
    // integer rounding of the counts perturbs the exact -1.5 slightly
    assert(math.abs(slope - (-1.5)) < 0.05, s"slope $slope")
  }

  test("vocabGrowth: monotone vocab, final point equals corpus distinct") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val rows = TextAnalysis.vocabGrowth(d, nBuckets = 10).collect()
    val vocabs = rows.map(_.getAs[Long]("vocab"))
    assert(vocabs.sorted === vocabs) // cumulative by construction
    val exact = d
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
        .as("t"))
      .distinct().count()
    assert(vocabs.last === exact)
    assert(rows.map(_.getAs[Long]("n_docs_cum")).last === d.count())
  }
}
