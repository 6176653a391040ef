package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine multinomial Naive Bayes — the second trainable model next to
  * the gradient-descent LR of t31, chosen because its training IS a
  * counting aggregate: the model is `count(label, token)` plus per-label
  * totals, so a 100 TB corpus trains in exactly one shuffle and the
  * fitted artifact is |labels|·|vocab| rows (broadcastable at serve
  * time). This is the fastText-era baseline every corpus-quality /
  * language-routing stack keeps around precisely because it scales as a
  * groupBy.
  *
  * Exactness contract (how a floating-point classifier hash-matches a
  * cross-engine oracle): log-probabilities are QUANTIZED at training
  * time — `logp_q = round(ln((c+1)/(tot+V)) · 10^6)` as BIGINT — and
  * scoring sums INTEGERS (`score_q = prior_q + Σ n_t · logp_q`), so the
  * per-doc score is associative/commutative with no float-summation
  * order dependence: both engines produce bit-identical scores and the
  * argmax is deterministic (ties break to the lexicographically first
  * label). The only cross-engine float op left is one `ln` per model
  * cell; a 1-ulp libm divergence flips a 10^6-scale rounding with
  * probability ~1e-10 per cell. Integer-quantized log-linear inference
  * is also what int8 serving deployments run, so the quantization is the
  * capability, not a test convenience.
  *
  * The label is token-derived (argmax of three keyword counts with a
  * fixed tie order) because the synthetic corpus's `lang`/`source`
  * columns are text-independent (t31's finding, Training.scala): a
  * learnable target must live in the text itself. NB trained on the
  * TRAIN split genuinely learns it; t36 reports per-class
  * precision/recall/F1 on the held-out TEST split.
  */
object NaiveBayes {

  /** Tie order is the CASE order: join > scan > merge on equal counts. */
  val labelKeywords: Seq[String] = Seq("join", "scan", "merge")

  private def kwCountIn(toks: Column, kw: String): Column =
    size(filter(toks, t => t === kw))

  /** [[ruleLabel]] over an ALREADY-TOKENIZED array column — the form the
    * training pass uses so the tokenizer kernel runs ONCE per document
    * (r16: `ruleLabel` + the training explode evaluated `word_tokens`
    * four times per row; guide §1.2 "per-task work"). */
  def ruleLabelFrom(toks: Column): Column = {
    val Seq(cj, cs, cm) = labelKeywords.map(kwCountIn(toks, _))
    when(cj >= cs && cj >= cm, lit("join"))
      .when(cs >= cm, lit("scan"))
      .otherwise(lit("merge"))
  }

  /** Token-derived 3-class label (argmax keyword count, fixed tie order). */
  def ruleLabel: Column = ruleLabelFrom(TextAnalysis.tokens(col("text")))

  /** Deterministic 70/30 split: integer arithmetic both engines share. */
  def isTrain: Column = pmod(col("doc_id"), lit(10)) < 7

  private val Q = 1e6

  /** Labeled per-(doc, token) counts for one split. */
  private def docTokens(docs: DataFrame, train: Boolean): DataFrame =
    // spreadIfNarrow: a one-row-group corpus file otherwise runs the
    // tokenize front on a single task (r16, the shingleSets note); a
    // many-split production scan skips the exchange. Projected to
    // (doc_id, text) first so the conditional exchange carries nothing
    // else (guide §2.3).
    graft.functions.Staging.spreadIfNarrow(
        docs.select(col("doc_id"), col("text")))
      .where(if (train) isTrain else !isTrain)
      // tokenize ONCE, then label + explode read the array: the fused
      // form ran the word_tokens kernel four times per document (three
      // keyword counts + the explode). CollapseProject keeps the
      // multi-referenced non-trivial alias in place (the hilbert-walk
      // precedent), so the plan carries exactly one kernel call.
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), ruleLabelFrom(col("__toks")).as("label"),
        explode(col("__toks")).as("token"))
      .groupBy("doc_id", "label", "token").agg(count(lit(1)).as("n"))

  /** Train-split corpus constants: vocab size V and train doc count, as
    * a one-row relation (bounded scalar broadcast, never a collect). */
  private def trainStats(trainToks: DataFrame): DataFrame =
    trainToks.agg(
      countDistinct("token").as("v"),
      countDistinct("doc_id").as("n_train_docs"))

  /** The collected fit: model cells (sorted by label, token) and the
    * per-label constants — bounded by |labels|·|vocab|, never
    * corpus-sized, so holding it on the driver is the same
    * bounded-artifact contract as BPE merge lists and PQ codebooks. */
  private case class NbFit(cells: Seq[(String, String, Long, Long)],
      consts: Seq[(String, Long, Long)])

  /** The model is fitted ONCE per memo key and all four registered
    * consumers (`t35_nb_model`, `t36_nb_classify`, `t37_nb_eval`,
    * `st26_stream_nb_serve`) derive from that single [[NbFit]] — the
    * same train-once / serve-many memo [[Training]] uses for LR
    * (round-9 verdict ask #4: the NB lane fitted up to four times per
    * bench pass). Semantics mirror the LR memo exactly:
    *  - [[model]] (the training query) ALWAYS refits and refreshes the
    *    memo, so the benched t35 time is a real training run;
    *  - the serving consumers read the memo when present and fit only
    *    when they run before any training query has (standalone order
    *    independence).
    * Callers pass `memoKey` = the data directory (immutable per the
    * harness contract); `memoKey = null` (the spec default) bypasses the
    * memo entirely so micro-corpus tests stay isolated. */
  private val fitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, NbFit]

  /** Count of full fits executed (spec observability). */
  private[operators] val fitCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** One corpus pass, one wide bounded relation: model cells CARRYING the
    * per-label constants on every row, so a single collect job yields
    * both artifacts (the previous shape ran two collect jobs, each
    * re-running the tokenize+explode aggregate — round-9 verdict ask #4's
    * second half). The train-token relation is deliberately NOT cached:
    * it is CORPUS-sized, and measured at sf0.1 the columnar cache
    * materialization costs more than the narrow re-run (3.9 → 5.5s when
    * persisted) — at 100 TB a corpus cache is memory the executors don't
    * have. */
  private def fittedWide(docs: DataFrame): DataFrame = {
    val tt = docTokens(docs, train = true)
    val stats = trainStats(tt)
    val labelTot = tt.groupBy("label").agg(
      sum("n").as("tot"), countDistinct("doc_id").as("n_docs"))
    tt.groupBy("label", "token").agg(sum("n").as("c"))
      .join(labelTot, "label")
      .crossJoin(stats)
      .select(col("label"), col("token"), col("c"),
        round(log((col("c") + 1).cast("double") / (col("tot") + col("v")))
          * Q).cast("long").as("logp_q"),
        round(log(col("n_docs").cast("double") / col("n_train_docs")) * Q)
          .cast("long").as("prior_q"),
        round(log(lit(1.0) / (col("tot") + col("v"))) * Q)
          .cast("long").as("default_q"))
  }

  private def collectFit(docs: DataFrame): NbFit = {
    fitCount.incrementAndGet()
    val rows = fittedWide(docs).collect()
    val cells = rows.toSeq.map(r => (r.getAs[String]("label"),
        r.getAs[String]("token"), r.getAs[Long]("c"),
        r.getAs[Long]("logp_q")))
      .sortBy(t => (t._1, t._2))
    val consts = rows.toSeq.map(r => (r.getAs[String]("label"),
        r.getAs[Long]("prior_q"), r.getAs[Long]("default_q")))
      .distinct.sortBy(_._1)
    NbFit(cells, consts)
  }

  private def fitFor(docs: DataFrame, memoKey: String,
      refresh: Boolean): NbFit =
    if (memoKey == null) collectFit(docs)
    else if (refresh) {
      val f = collectFit(docs); fitMemo.put(memoKey, f); f
    } else fitMemo.computeIfAbsent(memoKey, _ => collectFit(docs))

  /** The fitted model: per (label, token) occurrence count and quantized
    * Laplace-smoothed log-probability. Always a fresh fit (refreshes the
    * memo) — the training query's benched time must be a training run. */
  def model(docs: DataFrame, memoKey: String = null): DataFrame = {
    import docs.sparkSession.implicits._
    fitFor(docs, memoKey, refresh = true)
      .cells.toDF("label", "token", "c", "logp_q")
  }

  /** Driver-side serving artifacts — the bounded-artifact lifecycle the
    * BPE-merge and PQ-codebook lanes also use: per-label
    * `token → logp_q` maps plus `(prior_q, default_q)` per label. The
    * streaming scorer (`st26`) folds these into a stateless projection. */
  def servingArtifacts(docs: DataFrame, memoKey: String = null)
      : (Map[String, Map[String, Long]], Map[String, (Long, Long)]) = {
    val f = fitFor(docs, memoKey, refresh = false)
    val maps = f.cells.groupBy(_._1)
      .map { case (l, rows) => l -> rows.map(t => t._2 -> t._4).toMap }
    val consts = f.consts.map(t => t._1 -> ((t._2, t._3))).toMap
    (maps, consts)
  }

  /** Classify the held-out split: integer score per (doc, label), argmax
    * with deterministic tie-break. The model and the per-label constants
    * are broadcast local relations (the fit is memoized, bounded by
    * |labels|·|vocab|); the only shuffle is the per-doc token count and
    * the per-doc top-1 (a doc-partitioned window, never global). */
  def apply(docs: DataFrame, memoKey: String = null): DataFrame = {
    import docs.sparkSession.implicits._
    val f = fitFor(docs, memoKey, refresh = false)
    val m = f.cells.map(t => (t._1, t._2, t._4))
      .toDF("label", "token", "logp_q")
    val consts = f.consts.toDF("label", "prior_q", "default_q")
    val test = docTokens(docs, train = false)
      .withColumnRenamed("label", "true_label")
    val scored = test
      .crossJoin(broadcast(consts.select("label", "default_q")))
      .join(broadcast(m), Seq("label", "token"), "left")
      .groupBy(col("doc_id"), col("true_label"), col("label"))
      .agg(sum(col("n") * coalesce(col("logp_q"), col("default_q"))).as("tok_q"))
      .join(broadcast(consts.select("label", "prior_q")), "label")
      .select(col("doc_id"), col("true_label"), col("label"),
        (col("prior_q") + col("tok_q")).as("score_q"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("label"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("true_label"), col("label").as("pred"),
        col("score_q"))
      .orderBy("doc_id")
  }

  /** Held-out per-class evaluation: tp/fp/fn and precision/recall/F1
    * computed from the integer counts directly (no rounded-intermediate
    * reuse), one row per class. */
  def evaluate(docs: DataFrame, memoKey: String = null): DataFrame = {
    // the classification runs ONCE: four verdict aggregates consume the
    // predictions, and without the re-base + cache each would re-run the
    // whole score/argmax plan (Catalyst shares no common subplans —
    // measured 14.7s vs ~5s at sf0.1). The cached relation is the
    // narrow per-doc verdict, output-sized; released by the harness's
    // per-query clearCache.
    val preds0 = apply(docs, memoKey).select("doc_id", "true_label", "pred")
    val preds = org.apache.spark.sql.graft.Bridge.pinInternal(preds0)
      .persist()
    val classes = preds.select(col("true_label").as("class")).union(
      preds.select(col("pred").as("class"))).distinct()
    val tp = preds.where(col("pred") === col("true_label"))
      .groupBy(col("pred").as("class")).agg(count(lit(1)).as("tp"))
    val predCnt = preds.groupBy(col("pred").as("class"))
      .agg(count(lit(1)).as("n_pred"))
    val trueCnt = preds.groupBy(col("true_label").as("class"))
      .agg(count(lit(1)).as("n_true"))
    classes
      .join(tp, Seq("class"), "left")
      .join(predCnt, Seq("class"), "left")
      .join(trueCnt, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_true"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .select(col("class"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fp")).cast("double"), 6))
          .as("precision"),
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(round(col("tp") / (col("tp") + col("fn")).cast("double"), 6))
          .as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(0.0))
          .otherwise(round(lit(2) * col("tp")
            / (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"), 6))
          .as("f1"))
      .orderBy("class")
  }
}

/** DuckDB twins — the identical counting, quantization, and tie-break. */
object NaiveBayesSql {

  import TextAnalysisSql.toks

  private val kwCase = {
    def c(kw: String) = s"len(list_filter($toks, t -> t = '$kw'))"
    s"""CASE WHEN ${c("join")} >= ${c("scan")} AND ${c("join")} >= ${c("merge")}
       |     THEN 'join'
       |     WHEN ${c("scan")} >= ${c("merge")} THEN 'scan'
       |     ELSE 'merge' END""".stripMargin
  }

  /** Shared CTEs: labeled per-(doc, token) counts per split, train-side
    * totals, vocab size, label constants. */
  private val baseCtes: String =
    s"""labeled AS (
       |  SELECT doc_id, $kwCase AS label, text, doc_id % 10 < 7 AS is_train
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, label, is_train, t.token, count(*) AS n
       |  FROM labeled, unnest($toks) AS t(token)
       |  GROUP BY ALL),
       |stats AS (
       |  SELECT count(DISTINCT token) AS v,
       |         count(DISTINCT doc_id) AS n_train_docs
       |  FROM toks WHERE is_train),
       |cells AS (
       |  -- CAST: DuckDB sum() over INTEGER yields HUGEINT (int128); the
       |  -- driver's hash gate normalizes HUGEINT differently from BIGINT,
       |  -- so every integer output column must be BIGINT end-to-end.
       |  SELECT label, token, CAST(sum(n) AS BIGINT) AS c
       |  FROM toks WHERE is_train
       |  GROUP BY 1, 2),
       |labtot AS (
       |  SELECT label, sum(n) AS tot, count(DISTINCT doc_id) AS n_docs
       |  FROM toks WHERE is_train GROUP BY 1),
       |model AS (
       |  SELECT c.label, c.token, c.c,
       |         CAST(round(ln(CAST(c.c + 1 AS DOUBLE) / (lt.tot + s.v)) * 1e6)
       |           AS BIGINT) AS logp_q
       |  FROM cells c JOIN labtot lt ON lt.label = c.label CROSS JOIN stats s),
       |consts AS (
       |  SELECT lt.label,
       |         CAST(round(ln(CAST(lt.n_docs AS DOUBLE) / s.n_train_docs) * 1e6)
       |           AS BIGINT) AS prior_q,
       |         CAST(round(ln(1.0 / (lt.tot + s.v)) * 1e6)
       |           AS BIGINT) AS default_q
       |  FROM labtot lt CROSS JOIN stats s)""".stripMargin

  val model: String =
    s"""WITH $baseCtes
       |SELECT label, token, c, logp_q FROM model
       |ORDER BY label, token""".stripMargin

  private val applyCtes: String =
    s"""$baseCtes,
       |test AS (
       |  SELECT doc_id, label AS true_label, token, n FROM toks
       |  WHERE NOT is_train),
       |scored AS (
       |  SELECT t.doc_id, t.true_label, co.label,
       |         CAST(co.prior_q + sum(t.n * coalesce(m.logp_q, co.default_q))
       |           AS BIGINT) AS score_q
       |  FROM test t
       |  CROSS JOIN consts co
       |  LEFT JOIN model m ON m.label = co.label AND m.token = t.token
       |  GROUP BY t.doc_id, t.true_label, co.label, co.prior_q),
       |pred AS (
       |  SELECT doc_id, true_label, label AS pred, score_q,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score_q DESC, label) AS rn
       |  FROM scored)""".stripMargin

  val apply: String =
    s"""WITH $applyCtes
       |SELECT doc_id, true_label, pred, score_q FROM pred
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  val evaluate: String =
    s"""WITH $applyCtes,
       |p AS (SELECT doc_id, true_label, pred FROM pred WHERE rn = 1),
       |classes AS (SELECT true_label AS class FROM p
       |            UNION SELECT pred FROM p),
       |tp AS (SELECT pred AS class, count(*) AS tp FROM p
       |       WHERE pred = true_label GROUP BY 1),
       |pc AS (SELECT pred AS class, count(*) AS n_pred FROM p GROUP BY 1),
       |tc AS (SELECT true_label AS class, count(*) AS n_true FROM p GROUP BY 1)
       |SELECT c.class,
       |       coalesce(tp.tp, 0) AS tp,
       |       coalesce(pc.n_pred, 0) - coalesce(tp.tp, 0) AS fp,
       |       coalesce(tc.n_true, 0) - coalesce(tp.tp, 0) AS fn,
       |       CASE WHEN coalesce(pc.n_pred, 0) = 0 THEN 0.0
       |            ELSE round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
       |                       / pc.n_pred, 6) END AS precision,
       |       CASE WHEN coalesce(tc.n_true, 0) = 0 THEN 0.0
       |            ELSE round(CAST(coalesce(tp.tp, 0) AS DOUBLE)
       |                       / tc.n_true, 6) END AS recall,
       |       CASE WHEN 2 * coalesce(tp.tp, 0) + (coalesce(pc.n_pred, 0) - coalesce(tp.tp, 0))
       |                 + (coalesce(tc.n_true, 0) - coalesce(tp.tp, 0)) = 0 THEN 0.0
       |            ELSE round(2.0 * coalesce(tp.tp, 0)
       |                       / (2 * coalesce(tp.tp, 0)
       |                          + (coalesce(pc.n_pred, 0) - coalesce(tp.tp, 0))
       |                          + (coalesce(tc.n_true, 0) - coalesce(tp.tp, 0))), 6)
       |       END AS f1
       |FROM classes c
       |LEFT JOIN tp ON tp.class = c.class
       |LEFT JOIN pc ON pc.class = c.class
       |LEFT JOIN tc ON tc.class = c.class
       |ORDER BY c.class""".stripMargin
}
