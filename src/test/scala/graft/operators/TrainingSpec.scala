package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the in-engine LR trainer on a corpus with a PLANTED decision
  * rule: docs containing the token "needle" are positive, against a
  * shared background vocabulary — the trainer must recover the rule
  * from hashed presence features. The corpus face (`t31_*`) runs the
  * same code against the testdata's own planted lexical rule. */
class TrainingSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = {
    // 40 docs over an 8-token background vocabulary; half carry the
    // needle. Deterministic construction — no RNG, repeatable exactly.
    val bg = Vector("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta")
    (0L until 40L).map { i =>
      val words = (0 until 12).map(j => bg(((i + 1) * (j + 3)).toInt % 8))
      val text =
        if (i % 2 == 0) (words :+ "needle").mkString(" ")
        else words.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("lrVerify: recovers the planted rule — all gates true") {
    val row = Training.lrVerify(corpus,
        array_contains(TextAnalysis.tokens(col("text")), "needle"),
        memoKey = "spec-needle", dim = 64).head
    assert(row.getAs[Long]("n_train") === 32L)
    assert(row.getAs[Long]("n_holdout") === 8L)
    assert(row.getAs[Boolean]("loss_monotone"), "loss must fall every step")
    assert(row.getAs[Boolean]("loss_halved"), "loss must at least halve")
    assert(row.getAs[Boolean]("holdout_acc_ok"), "must classify the holdout")
  }

  test("train-once memo: verify after history adds no second fit; " +
      "history always retrains") {
    val pred = array_contains(TextAnalysis.tokens(col("text")), "needle")
    val k = "spec-memo"
    val before = Training.fitCount.get()
    Training.lrTrainHistory(corpus, pred, memoKey = k, dim = 64).collect()
    assert(Training.fitCount.get() === before + 1)
    // the gate derives from the memoized fit — no retrain
    Training.lrVerify(corpus, pred, memoKey = k, dim = 64).collect()
    assert(Training.fitCount.get() === before + 1,
      "lrVerify must reuse the fit lrTrainHistory just produced")
    // but the training query itself is never a cache hit
    Training.lrTrainHistory(corpus, pred, memoKey = k, dim = 64).collect()
    assert(Training.fitCount.get() === before + 2,
      "lrTrainHistory must recompute (its benched time is a real run)")
  }

  test("lrTrainHistory: loss starts at ln(2) and falls monotonically") {
    val hist = Training.lrTrainHistory(corpus,
        array_contains(TextAnalysis.tokens(col("text")), "needle"),
        memoKey = "spec-needle", dim = 64)
      .orderBy("iter").collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[Double]("loss")))
    assert(hist.length === 6)
    // zero weights score 0.5 everywhere: first loss is exactly -ln(0.5)
    assert(math.abs(hist.head._2 - math.log(2.0)) < 1e-6, hist.head.toString)
    hist.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b < a, s"loss must decrease: $a -> $b")
    }
  }
}
