package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

import graft.SparkSuite

/** Micro-corpus known-answer tests for the integer-quantized Naive Bayes
  * lane: the rule label's tie order, hand-computed model cells, exact
  * integer scores, and held-out evaluation counts. */
class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def q(x: Double): Long = math.round(math.log(x) * 1e6)

  test("ruleLabel: argmax keyword count, ties break join > scan > merge") {
    val labeled = docsOf(
      (0L, "join join scan"), // join 2 > scan 1
      (1L, "scan merge scan"), // scan 2 > merge 1
      (2L, "merge merge x"), // merge only
      (3L, "scan merge"), // 1-1 tie -> scan (earlier in the order)
      (4L, "join merge"), // 1-1 tie -> join
      (5L, "plain text")) // 0-0-0 tie -> join (first in CASE order)
      .select(col("doc_id"), NaiveBayes.ruleLabel.as("label"))
      .as[(Long, String)].collect().toMap
    assert(labeled === Map(0L -> "join", 1L -> "scan", 2L -> "merge",
      3L -> "scan", 4L -> "join", 5L -> "join"))
  }

  // Train docs (doc_id % 10 < 7): 0 "join x x", 1 "scan y".
  // Test docs: 7 "join x", 8 "scan y y".
  // Vocab V = {join, x, scan, y} = 4; per-label totals: join 3, scan 2.
  private val corpus = docsOf(
    (0L, "join x x"), (1L, "scan y"), (7L, "join x"), (8L, "scan y y"))

  test("model: hand-computed Laplace-smoothed quantized cells") {
    val m = NaiveBayes.model(corpus)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(m === Seq(
      ("join", "join", 1L, q(2.0 / 7)), // (1+1)/(3+4)
      ("join", "x", 2L, q(3.0 / 7)),
      ("scan", "scan", 1L, q(2.0 / 6)),
      ("scan", "y", 1L, q(2.0 / 6))))
  }

  test("classify: exact integer scores and argmax on the held-out split") {
    val preds = NaiveBayes(corpus)
      .as[(Long, String, String, Long)].collect().toSeq
    // doc 7 "join x": join = prior + logp(join) + logp(x); scan = prior
    // + 2 · default_scan (both tokens unseen for scan)
    val join7 = q(0.5) + q(2.0 / 7) + q(3.0 / 7)
    // doc 8 "scan y y": scan = prior + logp(scan) + 2·logp(y)
    val scan8 = q(0.5) + q(2.0 / 6) + 2 * q(2.0 / 6)
    assert(preds === Seq(
      (7L, "join", "join", join7),
      (8L, "scan", "scan", scan8)))
    // losing-side sanity: unseen-token defaults would have scored lower
    assert(q(0.5) + 2 * q(1.0 / 6) < join7)
    assert(q(0.5) + 3 * q(1.0 / 7) < scan8)
  }

  test("scores are integers end to end (no float summation order)") {
    val schema = NaiveBayes(corpus).schema
    assert(schema("score_q").dataType === LongType)
    assert(NaiveBayes.model(corpus).schema("logp_q").dataType === LongType)
  }

  test("evaluate: perfect held-out micro-corpus gives unit P/R/F1") {
    val ev = NaiveBayes.evaluate(corpus)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(ev === Seq(
      ("join", 1L, 0L, 0L, 1.0, 1.0, 1.0),
      ("scan", 1L, 0L, 0L, 1.0, 1.0, 1.0)))
  }

  test("fit memo: four consumers share one fit; model always refits") {
    val key = s"nb-memo-spec-${java.util.UUID.randomUUID()}"
    val before = NaiveBayes.fitCount.get()
    NaiveBayes(corpus, memoKey = key).collect() // first consumer fits
    assert(NaiveBayes.fitCount.get() === before + 1)
    NaiveBayes.evaluate(corpus, memoKey = key).collect() // memo hit
    NaiveBayes.servingArtifacts(corpus, memoKey = key) // memo hit
    assert(NaiveBayes.fitCount.get() === before + 1)
    NaiveBayes.model(corpus, memoKey = key).collect() // training refits
    assert(NaiveBayes.fitCount.get() === before + 2)
    NaiveBayes(corpus, memoKey = key).collect() // refreshed memo hit
    assert(NaiveBayes.fitCount.get() === before + 2)
    // memoized and fresh fits produce identical classifications
    assert(NaiveBayes(corpus, memoKey = key).collect().toSeq ===
      NaiveBayes(corpus).collect().toSeq)
  }

  test("evaluate: misclassified docs split into fp/fn correctly") {
    // Train teaches join={x}, scan={y}; test doc 9 is labeled scan
    // (rule: "scan" token) but its content tokens are join-ish x's.
    val tricky = docsOf(
      (0L, "join x x"), (1L, "scan y"),
      (7L, "join x"), (9L, "scan x x x"))
    val ev = NaiveBayes.evaluate(tricky)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    val byClass = ev.map(r => r._1 -> r).toMap
    // doc 9: pred join (x dominates), true scan -> join gets an fp,
    // scan gets an fn
    assert(byClass("join")._2 === 1L) // tp from doc 7
    assert(byClass("join")._3 === 1L) // fp from doc 9
    assert(byClass("scan")._4 === 1L) // fn from doc 9
    assert(byClass("join")._5 === 0.5) // precision 1/2
    assert(byClass("scan")._6 === 0.0) // recall 0/1
  }
}
