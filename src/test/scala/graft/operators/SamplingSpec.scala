package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Sampling]]: temperature-weighted source mixing and the seeded global
  * shuffle — the corpus-composition layer. The arithmetic itself is
  * oracle-checked (`p10_temperature_mix` / `p11_shuffle_shards`); these
  * tests pin the semantic invariants on a hand-checkable skewed corpus. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(sizes: (String, Int)*): DataFrame = {
    var id = 0L
    sizes.flatMap { case (src, n) =>
      (1 to n).map { _ => id += 1; (id, src) }
    }.toDF("doc_id", "source")
  }

  test("temperatureMix: sqrt weighting up-samples small sources, caps at 1") {
    // sizes 16/4/1 -> milliweights 4000/2000/1000, denom 7000, N=21,
    // target = 21*50 div 100 = 10
    val d = corpus("big" -> 16, "mid" -> 4, "tiny" -> 1)
    val got = Sampling.temperatureMix(d, targetPct = 50)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("milliweight"), r.getAs[Long]("thresh"), r.getAs[Long]("n_kept")))).toMap

    assert(got("big")._1 === 4000L && got("mid")._1 === 2000L && got("tiny")._1 === 1000L)
    // rate_tiny = 10*1000/(7000*1) > 1 -> capped: thresh = hashMod, whole
    // source kept (up-sampling a source beyond 1x is the trainer's job)
    assert(got("tiny")._2 === Sampling.hashMod)
    assert(got("tiny")._3 === 1L)
    // temperature ordering: smaller source -> strictly higher keep rate
    // thresh/n is the per-doc keep probability numerator
    val rateBig = got("big")._2.toDouble
    val rateMid = got("mid")._2.toDouble
    assert(rateBig < rateMid && rateMid < got("tiny")._2.toDouble)
    // exact thresholds from the integer rule: floor(10*w/(7000*n) * M)
    assert(got("big")._2 === math.floor(10.0 * 4000 / (7000 * 16) * Sampling.hashMod).toLong)
    assert(got("mid")._2 === math.floor(10.0 * 2000 / (7000 * 4) * Sampling.hashMod).toLong)
  }

  test("temperatureMix: uniform sources degrade to plain targetPct sampling") {
    val d = corpus("a" -> 10, "b" -> 10)
    val rows = Sampling.temperatureMix(d, targetPct = 50).collect()
    val threshes = rows.map(_.getAs[Long]("thresh")).toSet
    assert(threshes.size === 1) // identical rate everywhere
    // expected rate exactly 1/2: floor(0.5 * M)
    assert(threshes.head === Sampling.hashMod / 2)
  }

  test("tokenBudget: targets conserve the budget; small sources get more epochs") {
    val d = Seq(
      (1L, "big", "one two three four five six seven eight nine ten"),
      (2L, "big", "one two three four five six seven eight nine ten"),
      (3L, "big", "one two three four five six seven eight nine ten"),
      (4L, "tiny", "just four small tokens"))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.tokenBudget(d, budget = 1000)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("avail_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Double]("epochs")))).toMap
    assert(rows("big")._1 === 30L && rows("tiny")._1 === 4L)
    // integer floor division: the per-source targets never exceed budget
    assert(rows.values.map(_._2).sum <= 1000L)
    // sqrt weighting: the small source repeats more (here 66.75 vs 24.4 —
    // sqrt compresses the 7.5x size gap into a 2.7x epoch gap)
    assert(rows("tiny")._3 > rows("big")._3 * 2)
    // epochs is exactly target/avail rounded
    rows.values.foreach { case (avail, target, epochs) =>
      assert(epochs === BigDecimal(target.toDouble / avail)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("exportCorpus: each composed stage drops exactly its targets") {
    // scores (hand-checked vs the kernel): doc 1 = +1252, doc 3 = -2000,
    // doc 4 = +84, doc 5 = -606; doc 2 normalizes equal to doc 1
    val d = Seq(
      (1L, "srcA", "the quick brown fox jumps"),
      (2L, "srcA", "THE quick, brown fox jumps!!"), // exact dup of 1
      (3L, "srcA", "a a a a"),                      // model gate: score < 0
      (4L, "srcB", "another perfectly fine document"),
      (5L, "srcB", "good tokens here live"))        // model gate: score < 0
      .toDF("doc_id", "source", "text")
    // targetPct=100 with survivors 1 per srcB, 1 per srcA -> rate 1
    // everywhere: the mix stage passes everyone, isolating the two gates
    val got = Sampling.exportCorpus(d, targetPct = 100)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("shard"), r.getAs[Int]("pos")))
    assert(got.map(_._1).toSet === Set(1L, 4L))
    assert(got.forall(_._4 === 1)) // one doc per shard here -> pos dense
    // and the mix stage does engage at a lower target
    val mixed = Sampling.exportCorpus(d, targetPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixed.subsetOf(Set(1L, 4L)))
  }

  test("sampling hash domain: negative ids hash into [0, M), shards stay valid") {
    // the r6 twin fix folds the SQL side non-negative to match pmod; this
    // pins the Spark side's half of that contract (the cross-engine
    // parity for negative ids was verified against DuckDB directly)
    val ids = Seq(-1L, -5L, -1000003L, -999999999999L, 7L)
    val d = ids.map((_, "s")).toDF("doc_id", "source")
    val got = Sampling.shuffleShards(d, nShards = 4).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet === ids.toSet)
    got.foreach(r => assert((0 until 4).contains(r.getAs[Int]("shard"))))
    // targetPct=100 -> thresh = M; keep requires hash in [0, M)
    val keep = Sampling.temperatureKeep(d, targetPct = 100).collect()
    assert(keep.length === ids.length && keep.forall(_.getAs[Boolean]("keep")))
  }

  test("calibrateQuality: cutoff is the marginal kept doc's score, budget honored") {
    // 10 docs in one source: keepPct=30 -> k=3, cutoff = the 3rd-highest
    // quality; the top-3 scores here are distinct (longer docs win the
    // length term), so exactly k docs score >= cutoff
    val d = (1 to 10).map { i =>
      (i.toLong, "s", ("the a of " * i) + (1 to i).map(j => s"w$j$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val row = Sampling.calibrateQuality(d, keepPct = 30).collect().head
    assert(row.getAs[Long]("n_docs") === 10L)
    assert(row.getAs[Long]("n_kept") === 3L)
    val cutoff = row.getAs[Double]("cutoff")
    val scores = graft.operators.TextAnalysis.qualityScore(d)
      .select("quality").collect().map(_.getDouble(0)).sorted.reverse
    assert(cutoff === scores(2), "cutoff must be the k-th highest quality")
    assert(scores.count(_ >= cutoff) === 3)
  }

  test("curriculumPhases: equal-count phases, quality monotone across phases") {
    val d = (1 to 12).map { i =>
      (i.toLong, "s", ("the a of " * i) + (1 to i).map(j => s"w$j$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val got = Sampling.curriculumPhases(d, nPhases = 4).collect()
    assert(got.length === 12)
    val byPhase = got.groupBy(_.getAs[Long]("phase")).view
      .mapValues(_.map(_.getAs[Double]("quality"))).toMap
    assert(byPhase.keySet === Set(1L, 2L, 3L, 4L))
    assert(byPhase.values.forall(_.length === 3), "equal-count phases")
    // phase boundaries never invert quality order (ties may straddle)
    (1L to 3L).foreach { p =>
      assert(byPhase(p).max <= byPhase(p + 1).min,
        s"phase $p max must not exceed phase ${p + 1} min")
    }
  }

  test("oovRate: exact fraction against the top-K vocab, zero for all-vocab docs") {
    val d = Seq(
      (1L, "the the the"),          // all tokens in any top-2 vocab
      (2L, "the zebra"),            // 1 of 2 OOV
      (3L, "qq zz xx yy")           // all OOV (singletons lose top-2 to 'the')
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = TextAnalysis.oovRate(d, topK = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("oov_rate")).toMap
    assert(got(1L) === 0.0)
    // vocab = top-2 by (count desc, token): 'the' (4) + one singleton —
    // deterministic tie-break picks 'qq' (lexicographically first)
    assert(got(2L) === 0.5)
    assert(got(3L) === 0.75)
  }

  test("shuffleShards: a permutation into dense per-shard positions, deterministic") {
    val d = corpus("a" -> 40)
    val a = Sampling.shuffleShards(d, nShards = 4).collect()
    val b = Sampling.shuffleShards(d, nShards = 4).collect()
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted) // seeded == rerunnable
    assert(a.map(_.getAs[Long]("doc_id")).toSet === (1L to 40L).toSet) // permutation
    val byShard = a.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.subsetOf((0 until 4).toSet))
    byShard.foreach { case (_, rows) => // dense 1..n emit order per shard
      assert(rows.map(_.getAs[Int]("pos")).sorted === (1 to rows.length).toArray)
    }
    // the shuffle actually breaks id locality: consecutive ids land on
    // different shards somewhere in the corpus
    val shardOf = a.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    assert((1L until 40L).exists(i => shardOf(i) != shardOf(i + 1)))
  }

  test("dsirSelect: keeps exactly n*pct div 100 top-weighted candidates, sharded dense") {
    // 2 target docs teach the LM "the cat sat"; 8 candidates: 4 echo the
    // target phrasing, 4 are alien. keepPct=50 -> exactly 4 survivors,
    // and they must be the 4 target-like ones.
    val rows =
      Seq((100L, "tgt", "the cat sat on the mat"),
        (101L, "tgt", "the cat sat on the rug")) ++
        (1L to 4L).map(i => (i, "raw", "the cat sat on the mat")) ++
        (5L to 8L).map(i => (i, "raw", s"zq$i xv qj wk zq$i xv"))
    val d = rows.toDF("doc_id", "source", "text")
    val got = Sampling.dsirSelect(d, col("source") === "tgt",
      keepPct = 50, nShards = 2).collect()
    assert(got.length === 4) // 8 * 50 div 100
    assert(got.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 3L, 4L))
    // dense per-shard positions
    got.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted === (1 to rs.length).toArray)
    }
  }

  test("weightedSample: exact size, dense ranks, weight-biased, deterministic") {
    // 200 light docs (w=10) vs 200 heavy (w=1000): E-S priorities
    // u^(1/w) concentrate near 1 for heavy docs, so the sample must
    // over-represent them strongly
    val d = (1L to 200L).map(i => (i, "light", 10L))
      .++((201L to 400L).map(i => (i, "heavy", 1000L)))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.weightedSample(d, k = 50).collect()
    assert(got.length === 50)
    assert(got.map(_.getAs[Int]("rank")).sorted === (1 to 50).toArray)
    val heavy = got.count(_.getAs[String]("source") == "heavy")
    // E[heavy] ≈ 50·(1000/1010-ish) — anything over 40 proves the bias;
    // the draw is deterministic, so no flake margin is needed
    assert(heavy >= 40, s"heavy docs in sample: $heavy of 50")
    // reproducible bit for bit (the property the hash-drawn u exists for)
    val again = Sampling.weightedSample(d, k = 50).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("stratifiedWeightedSample: k per group, dense per-group ranks") {
    val d = (1L to 100L).map(i => (i, s"src${i % 4}", 10L + i))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.stratifiedWeightedSample(d, kPerGroup = 3).collect()
    assert(got.length === 12) // 4 sources x 3
    got.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.length === 3, src)
      assert(rs.map(_.getAs[Int]("rank")).sorted === Array(1, 2, 3))
    }
  }

  test("consistentSample: hash key is the JDK md5 of the decimal id") {
    val d = (1L to 20L).map(i => (i, "en")).toDF("doc_id", "lang")
    val got = Sampling.consistentSample(d, kPerGroup = 20).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { r =>
      val expect = md.digest(r.getAs[Long]("doc_id").toString
          .getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(r.getAs[String]("hk") === expect)
    }
    // ranks follow the hash order, densely per stratum
    assert(got.map(_.getAs[Int]("rank")).sorted === (1 to 20).toArray)
  }

  test("consistentSample: verdicts survive corpus growth (the RNG killer)") {
    val small = (1L to 50L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val grown = (1L to 80L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.consistentSample(df, kPerGroup = 5).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    val a = ids(small)
    val b = ids(grown)
    // a doc sampled from the grown corpus that already existed in the
    // small one must have been sampled there too — new docs can only
    // displace, never reshuffle (bottom-k by hash is monotone)
    val survivors = b.filter { case (_, id) => id <= 50 }
    assert(survivors.subsetOf(a),
      s"pre-existing sampled docs must come from the old sample: " +
        s"new=$survivors old=$a")
    assert(a.size === 10 && b.size === 10) // 2 strata x 5
  }

  test("joinSizeEstimate: a full-domain sample reproduces the exact size") {
    // keys 1..20 with frequency = key % 5 + 1 → exact = Σ f(k)²
    val df = (1L to 20L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("user_id")
    val exact = (1L to 20L).map(k => { val f = k % 5 + 1; f * f }).sum
    val r = Sampling.joinSizeEstimate(df, col("user_id"),
      threshold = Sampling.hashMod).collect().head
    assert(r.getAs[Long]("exact_pairs") === exact)
    assert(r.getAs[Double]("est_pairs") === exact.toDouble)
    assert(r.getAs[Long]("sample_keys") === 20L)
    assert(r.getAs[Double]("rel_err") === 0.0)
  }

  test("joinSizeEstimate: the default key sample lands near the exact " +
      "size on the real event stream") {
    val events = Tables(spark, "/root/testdata/sf0.01", "events")
    val r = Sampling.joinSizeEstimate(events, col("user_id"))
      .collect().head
    // deterministic hash sample → a fixed, reproducible error (measured
    // 0.89% at sf0.01); the bound just keeps the estimator honest
    assert(r.getAs[Long]("sample_keys") > 10L)
    assert(r.getAs[Double]("rel_err") < 0.05,
      s"estimate drifted: $r")
  }
}
