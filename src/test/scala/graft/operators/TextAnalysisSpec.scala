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

  test("kneserNeyScore: hand-checked probabilities on a tiny corpus") {
    import org.apache.spark.sql.functions.col
    // train: "a b", "a b", "a c", "c b"  (in_train = doc_id < 4)
    // bigram types: (a,b) c=2, (a,c) c=1, (c,b) c=1 -> B = 3
    // ctx:  a: c_prev=3, n_follow=2;  c: c_prev=1, n_follow=1
    // cont: b: n_precede=2;           c: n_precede=1
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "c b"),
      (4L, "a b"), (5L, "b c"), (6L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(docs, col("doc_id") < 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"))).toMap
    val d = 0.75
    // doc 4 "a b": seen (a,b): (2-d)/3 + d*2/3*(2/3)
    val p4 = (2 - d) / 3 + d * 2 / 3 * (2.0 / 3)
    assert(got(4L) === (1L, BigDecimal(-math.log(p4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // doc 5 "b c": context b unseen -> pure continuation Pc(c) = 1/3
    val p5 = 1.0 / 3
    assert(got(5L) === (1L, BigDecimal(-math.log(p5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // doc 6 "x y": y never a continuation -> floor d/B
    val p6 = d / 3
    assert(got(6L) === (1L, BigDecimal(-math.log(p6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("kneserNeyScore: per-context probability mass is bounded by 1") {
    import org.apache.spark.sql.functions._
    // over the real corpus: for every SEEN context v, the discounted
    // bigram mass plus the interpolation weight's continuation mass must
    // sum to <= 1 (equality holds when every continuation of v is in the
    // continuation vocabulary; <= covers the floor/OOV paths)
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val toked = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val bi = toked.where(size(col("toks")) >= 2)
      .select(explode(TextAnalysis.bigrams("toks")).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .agg(count(lit(1)).as("c_bi"))
    val cont = bi.groupBy("cur").agg(count(lit(1)).as("n_precede"))
    val b = cont.agg(sum("n_precede")).head.getLong(0).toDouble
    val d = 0.75
    val mass = bi
      .join(cont, Seq("cur"))
      .groupBy("prev")
      .agg((sum(greatest(col("c_bi").cast("double") - lit(d), lit(0.0)))
          / sum("c_bi")
        + lit(d) * count(lit(1)) / sum("c_bi")
          * (sum(col("n_precede")) / lit(b))).as("m"))
    val bad = mass.where(col("m") > 1.0 + 1e-9).count()
    assert(bad === 0L, s"$bad contexts with probability mass > 1")
  }

  test("heapsAudit: exact power law fits beta exactly; flat vocab " +
      "fits slope 0 with undefined r2") {
    // doc_ids 0..9 -> 10 buckets of one doc each, arranged so the
    // CUMULATIVE totals hit cum_toks = 4^(i+1) and cum_vocab = 2^(i+1)
    // exactly (bucket 0 carries 4 tokens / 2 fresh; bucket i > 0 adds
    // 4^(i+1)-4^i tokens with 2^(i+1)-2^i fresh): V = sqrt(n) ->
    // slope 1/2, r2 = 1 (up to the shared 1e-6 quantization).
    val docs = (0 until 10).map { i =>
      val toks =
        if (i == 0) 4L else (1L << (2 * (i + 1))) - (1L << (2 * i))
      val fresh =
        if (i == 0) Seq("w0", "w1")
        else ((1L << i) until (1L << (i + 1))).map(v => s"w$v")
      (i.toLong,
        (fresh ++ Seq.fill((toks - fresh.size).toInt)("w0")).mkString(" "))
    }.toDF("doc_id", "text")
    val r = TextAnalysis.heapsAudit(docs, nBuckets = 10)
      .as[(Long, Double, Double, Double)].collect().head
    assert(r._1 === 10L)
    assert(math.abs(r._2 - 0.5) < 1e-5, s"beta ${r._2}")
    assert(r._4 > 0.9999999, s"r2 ${r._4}")
    // saturated vocabulary: every token seen in bucket 0 -> flat curve,
    // slope exactly 0, r2 undefined (NULL), intercept = ln(vocab)
    val flat = (0 until 10)
      .map(i => (i.toLong, "alpha beta gamma")).toDF("doc_id", "text")
    val f = TextAnalysis.heapsAudit(flat, nBuckets = 10).collect().head
    assert(f.getDouble(1) === 0.0)
    assert(math.abs(f.getDouble(2) - math.log(3.0)) < 1e-5)
    assert(f.isNullAt(3))
  }

  test("heapsSynth: the integer-Zipf stream fits a non-degenerate " +
      "beta ~ 1/2 with r2 defined (r10 verdict ask #4)") {
    // synthetic lineitem key space: 20k positions across ~3k orderkeys.
    // The s = 2 integer inverse-CDF draw gives V(n) ~ sqrt(n), so the
    // fitted Heaps exponent must land NEAR 1/2 with a tight fit — the
    // power-law branch the shipped 31-token corpus can never exercise.
    val li = (0 until 20000)
      .map(i => ((i / 7).toLong + 1, (i % 7).toLong + 1))
      .toDF("l_orderkey", "l_linenumber")
    val r = TextAnalysis.heapsSynth(li, nBuckets = 10)
      .as[(Long, Double, Double, Double)].collect().head
    assert(r._1 === 10L)
    assert(r._2 > 0.35 && r._2 < 0.65, s"beta ${r._2} not near 1/2")
    assert(r._4 > 0.95, s"r2 ${r._4} not a tight power-law fit")
  }

  test("tfidfRetrieval: hand-computed cosines; ubiquitous terms carry " +
      "no weight; self excluded") {
    // doc 0 is the query (0 % 100 == 0). 'apple' appears in every doc ->
    // idf 0 -> dropped everywhere. Shared discriminative term: 'banana'.
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple banana"),          // identical nonzero vector -> cos 1
      (3L, "apple banana banana cherry"), // partial match
      (7L, "apple cherry"))          // no shared nonzero term -> absent
      .toDF("doc_id", "text")
    val r = TextAnalysis.tfidfRetrieval(docs, queryMod = 100, topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    // quantized idf: banana df=3/N=4 -> q_b = round(ln(4/3)·1e6);
    // cherry df=2 -> q_c = round(ln(2)·1e6)
    val qB = math.round(math.log(4.0 / 3) * 1e6)
    val qC = math.round(math.log(2.0) * 1e6)
    val cos03 = BigDecimal((qB * (2 * qB)).toDouble /
        (math.sqrt((qB * qB).toDouble) *
          math.sqrt((2 * qB * 2 * qB + qC * qC).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq((0L, 1, 1L, 1.0), (0L, 2, 3L, cos03)))
  }

  test("zipfAudit: an exact rank^-1 law fits slope -1 with r2 = 1") {
    // token frequencies 12, 6, 4, 3 = 12 / rank for ranks 1..4, so
    // ln(freq) = ln 12 - 1·ln(rank): slope -1, intercept ln 12, r2 1
    // (up to the 1e-6 log quantization both engines share).
    val words =
      Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++ Seq.fill(4)("cc") ++
        Seq.fill(3)("dd")
    val docs = words.grouped(5).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val r = TextAnalysis.zipfAudit(docs, topN = 10)
      .as[(Long, Double, Double, Double)].collect().head
    assert(r._1 === 4L)
    assert(math.abs(r._2 - (-1.0)) < 1e-5, s"slope ${r._2}")
    assert(math.abs(r._3 - math.log(12.0)) < 1e-5, s"intercept ${r._3}")
    assert(r._4 > 0.9999999, s"r2 ${r._4}")
  }

  test("rake: hand-computed deg/freq scores, stopword segmentation, " +
      "occurrence counting and the tie-broken head") {
    // doc 1 "big data the big model": runs [big data], [big model]
    // doc 2 "big data is big data": runs [big data] ×2
    // word stats over ALL runs: big freq 4 deg 8, data freq 3 deg 6,
    // model freq 1 deg 2 — every score 2.0 → both phrases score 4.0;
    // "big data" sorts first by text and carries 3 occurrences
    val docs = Seq(
      (1L, "big data the big model"),
      (2L, "big data is big data")).toDF("doc_id", "text")
    val r = TextAnalysis.rake(docs, topK = 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r === Seq(
      ("big data", 2L, 3L, 4.0),
      ("big model", 2L, 1L, 4.0)))
  }

  test("rake: a stopword-free document is ONE run and the 2-4 word " +
      "candidate band drops it from the report") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 6-word run: banded out
      (2L, "alpha beta the alpha beta")).toDF("doc_id", "text")
    val r = TextAnalysis.rake(docs, topK = 10)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r.map(_._1) === Seq("alpha beta"))
    // but the 6-word run still feeds the word stats: alpha deg =
    // 6 + 2 + 2 = 10 over freq 3, beta likewise → score 2 × 10/3
    assert(r.head._4 === BigDecimal(20.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
