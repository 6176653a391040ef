package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape audit: locks in the physical-plan properties the 100 TB
  * design depends on, so a regression (a lost broadcast hint, a pruned
  * column creeping back, a limit degenerating into a global sort) fails
  * CI instead of surfacing as a cluster bill. Plans are built at sf0.001;
  * nothing here executes a job except plan construction.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** `collect` that sees through AQE wrappers. `SparkPlan.collect` stops
    * at `AdaptiveSparkPlanExec` / `QueryStageExec` (both are leaves to
    * tree traversal), so a naive `executedPlan.collect` inspects only the
    * outermost wrapper and an is-empty assertion passes VACUOUSLY. This
    * helper descends through the adaptive wrappers but deliberately NOT
    * into `InMemoryTableScan`'s cached subtree — cached fragments execute
    * once at materialization, which is exactly what cache-reuse audits
    * need to distinguish. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(deepCollect(_)(pf))
  }

  test("j1: dimension side broadcasts; no sort-merge join") {
    val p = plan("j1_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimension join must not shuffle-sort")
  }

  test("p7: order+limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("p7_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t1: documents scan prunes to (doc_id, text)") {
    val p = plan("t1_token_stats")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("source"),
      s"unused columns must not reach the scan: $read")
  }

  test("mm1: media metadata is a narrow projection, no shuffle") {
    val p = plan("mm1_meta")
    // orderBy for the oracle adds one exchange for the sort, but the
    // metadata derivation itself must not aggregate or join
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("sim_topk: query side broadcasts into a nested-loop probe") {
    val p = plan("sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bloom_probe_totals: cogroup probe — slabs cogrouped with routed " +
      "probes, no join row ever carries the bitset") {
    // the r14 sf5 lesson: a join-shaped probe copies the joined BINARY
    // per probe row (getBinary memcpy, measured 403s at sf5); the lane
    // now probes via CoGroup (one bits extraction per slab per group)
    val p = plan("bloom_probe_totals")
    assert(p.contains("CoGroup"), s"probe must stay cogroup-shaped:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded geometry relation must broadcast into routing:\n$p")
    assert(!p.contains("bloom_might_contain"),
      s"no join-row probe expression may reappear (the memcpy term):\n$p")
  }

  test("j5: as-of join contains no join operator at all") {
    // the union + keyed-window formulation replaces the per-pair join
    // entirely; a Join node appearing here means the rewrite regressed
    val p = plan("j5_asof_join")
    assert(!p.contains("Join"), s"as-of must stay join-free:\n$p")
    assert(p.contains("Window"), p)
  }

  test("j6: bucketed range join is an equi-join, not a nested loop") {
    val p = plan("j6_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not fall back to a per-pair plan:\n$p")
  }

  test("p5: the scan-level predicate reaches the parquet reader") {
    val p = plan("p5_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity"), s"expected a pushed filter: $pushed")
  }

  test("e2: session windows plan as MergingSessions, not a self-join") {
    val p = plan("e2_sessionize")
    assert(p.contains("MergingSessions"), p)
    assert(!p.contains("Join"), s"sessionization must not self-join:\n$p")
  }

  test("t12: per-doc top-k is pruned map-side by WindowGroupLimit") {
    val p = plan("t12_tfidf")
    assert(p.contains("WindowGroupLimit"),
      s"shuffle must carry only topK+ties rows per doc:\n$p")
  }

  test("t13: global rank plans as a top-k, not a full sort of scored docs") {
    val p = plan("t13_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    // r16 (VERDICT r15 ask #2): the rank window must sit ABOVE the top-k
    // (the gr7/p14 pattern) — every scored doc funneled through one task
    // when the rank-filter form ran row_number() over the full relation
    assert(p.indexOf("TakeOrderedAndProject") > p.indexOf("Window"),
      s"rank window must run over the bounded topK rows:\n$p")
  }

  // formatted explain renders each node in the tree AND a detail header
  // "(n) NodeName" — count the headers for an exact node census
  private def nodeCount(p: String, node: String): Int =
    p.linesIterator.count(_.matches(s"""\\(\\d+\\) $node.*"""))

  test("g4: grouping sets ride one scan and one Expand") {
    val p = plan("g4_grouping_sets")
    assert(nodeCount(p, "Scan parquet") === 1,
      s"grouping sets must not rescan:\n$p")
    assert(p.contains("Expand"), p)
  }

  test("mm6: quantization audit is one projection — no shuffle beyond the sort") {
    val p = plan("mm6_quantize")
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    assert(nodeCount(p, "Exchange") === 1, // orderBy only
      s"quantize must stay a narrow projection:\n$p")
  }

  test("partitioned sink read-back prunes partitions at the scan") {
    // the point of the hive-layout training shards (k2): a lang predicate
    // must become a PartitionFilter (directories skipped), never a row
    // filter over the full corpus
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_prune").toString
    operators.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    val read = spark.read.parquet(path).where(col("lang") === "en")
    val p = read.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"lang predicate must prune partitions: $pf\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Filter") && l.contains("lang")
        && !l.contains("PartitionFilters")),
      s"lang must not survive as a row filter:\n$p")
  }

  test("bloom probe executes inside whole-stage codegen") {
    // the native-expression claim, checked on the EXECUTED plan (AQE only
    // finalizes codegen spans at runtime): star-prefixed nodes are
    // whole-stage-compiled, and the probe projection must be one of them.
    // Checked on the sharded zero-FN gate (r15: the last registered
    // JOIN-form probe — bloom_probe_totals and the fpstats faces moved
    // to the cogroup form; 2KB slabs keep this lane's carried bytes
    // bounded, per the fpStatsSharded fence)
    val df = SparkEntry.queries("bloom_sharded_zero_fn")(spark, dir)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rendered = executed.toString
    assert(rendered.contains("*("), s"no whole-stage codegen span:\n$rendered")
    assert(rendered.linesIterator.exists(l =>
      l.contains("bloom_might_contain") && l.contains("*(")),
      s"probe expression not in a codegen span:\n$rendered")
  }

  test("sim_ann_pq: encode is a narrow projection; shortlist broadcasts into re-rank") {
    val p = plan("sim_ann_pq")
    // encode/table/score are native projections — the corpus-touching part
    // of the plan must not explode subvectors or join a centroid table
    assert(p.contains("pq_encode"), p)
    assert(p.contains("pq_table"), p)
    assert(p.contains("pq_adc"), p)
    assert(!p.contains("Generate"), "no subvector explode in the query plan")
    // the re-rank joins the tiny shortlist INTO the corpus (BuildLeft via
    // the explicit broadcast) — never the corpus into the shortlist
    assert(p.contains("BroadcastHashJoin Inner BuildLeft"), p)
  }

  test("dedup_editdist: banded blocking joins on (lang, bucket) — never a nested loop") {
    val p = plan("dedup_editdist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "edit-distance candidates must come from the equi-join blocking, " +
        "not an all-pairs join:\n" + p)
  }

  test("d3_scd2: one shuffle on the dimension key, no self-join") {
    val p = plan("d3_scd2")
    assert(nodeCount(p, "Exchange") <= 2, // key window + final orderBy
      "SCD-2 must be a single window pass plus the presentation sort:\n" + p)
    assert(!p.contains("Join"), "lead() window, not a self-join:\n" + p)
  }

  test("a9_hll_merge: sketches partial-aggregate before the merge shuffle") {
    val p = plan("a9_hll_merge")
    // both aggregation levels show a partial then final mode — each
    // executor ships one sketch per group, not its raw keys
    assert(p.toLowerCase.contains("objecthashaggregate"),
      "datasketches agg should ride ObjectHashAggregate:\n" + p)
  }

  test("join strategy obeys the broadcast threshold knob") {
    // the same logical join flips BroadcastHashJoin -> SortMergeJoin when
    // broadcasting is disabled: the strategy is a cost decision under our
    // control, not an accident of the default config
    val sp = spark.newSession()
    import org.apache.spark.sql.functions.{broadcast => _, _}
    def j = {
      val c = graft.operators.Tables(sp, dir, "customer")
      val o = graft.operators.Tables(sp, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    }
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", (10 << 20).toString)
    val bhj = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(bhj.contains("BroadcastHashJoin"), bhj)
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val smj = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(smj.contains("SortMergeJoin") && !smj.contains("BroadcastHashJoin"),
      smj)
  }

  test("x3: dim filter prunes fact partitions at runtime (DPP)") {
    val p = plan("x3_dpp")
    assert(p.contains("dynamicpruningexpression"),
      "fact scan must carry a runtime partition filter fed by the dim " +
        "side's build:\n" + p)
  }

  test("shuffled hash join is reachable when sort-merge is a bad fit") {
    // the third join strategy: when one side is modest but over the
    // broadcast budget, hashing it per-partition beats sorting BOTH sides.
    // The planner only picks it when per-partition size stats allow a
    // local hash map; the SHUFFLE_HASH hint is the explicit user-facing
    // lever and must reach the physical operator
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val c = graft.operators.Tables(s, dir, "customer").hint("shuffle_hash")
    val o = graft.operators.Tables(s, dir, "orders")
    val p = o.join(c, o("o_custkey") === c("c_custkey"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // the other half of runtime re-planning (skew split is below): a tiny
    // aggregate shuffled across 32 partitions must execute with AQE
    // merging them down instead of scheduling 32 near-empty tasks
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    import org.apache.spark.sql.functions._
    val df = graft.operators.Tables(s, dir, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    df.collect() // execute so AQE finalizes the plan
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("AQEShuffleRead") &&
      executed.contains("coalesced"),
      "expected runtime-coalesced shuffle read:\n" + executed)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // The 100 TB skew story is two-layered: explicit salting where the hot
    // keys are known (x1_salted_join), and AQE's OptimizeSkewedJoin as the
    // runtime safety net for the ones that aren't. This locks the safety
    // net: a sort-merge join with one hot key and test-scale thresholds
    // must execute with the skewed partition split (skew=true on the
    // join), not one straggler task.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import org.apache.spark.sql.functions._
    // ~95% of left rows share key 0; the payload pads partition bytes over
    // the skew threshold
    val left = s.range(0, 40000).select(
      when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97).as("key"),
      concat(lit("x" * 64), col("id")).as("payload"))
    val right = s.range(0, 97).select(col("id").as("key"),
      col("id").cast("string").as("tag"))
    val joined = left.join(right, "key")
    // execute THIS plan (count() would build its own QueryExecution)
    assert(joined.collect().length === 40000)

    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rendered = executed.toString
    assert(rendered.contains("skew=true"),
      s"skewed partition was not split:\n$rendered")
  }

  test("dedup_exact: bulk corpus exchanges carry hashes, not document text") {
    // exactKeepers' full-corpus passes must shuffle (doc_id, fp) only;
    // the normalized text may appear in exchanges exclusively on the
    // repeated-fingerprint sliver, which sits BELOW the dupFps join
    // AQE off for this audit: the adaptive wrapper hides exchanges from
    // collect() until stages materialize; the static plan shows them all
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.operators.Dedup.exactKeepers(
          graft.operators.Tables(spark, dir, "documents"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val df = graft.operators.Dedup.exactKeepers(
      graft.operators.Tables(spark, dir, "documents"))
    assert(exchanges.nonEmpty)
    // the aggregate-side exchange (fp count) must be hash-only: no string
    // column in its output schema
    val narrow = exchanges.filter(_.child.schema.fields
      .forall(f => f.dataType != org.apache.spark.sql.types.StringType))
    assert(narrow.nonEmpty,
      s"no narrow (text-free) exchange found:\n${df.queryExecution.executedPlan}")

    // the flagship probe pipeline: bloom_fpstats' plan must contain NO
    // broadcast join at all anymore — the probe is a projection
    val p = plan("bloom_fpstats")
    assert(p.contains("bloom_probe_groups"), p)
    assert(!p.contains("BroadcastHashJoin"),
      "collected probe must not join the filter table")
  }

  test("bloom_sharded_reload: reloaded slabs probe through the COGROUP " +
      "shape — no join-materialized binary in the plan (r15)") {
    val p = plan("bloom_sharded_reload")
    // the cogroup probe: routed probes and slabs meet in CoGroup, bits
    // extracted once per (rating, shard) group — the join form's
    // per-probe-row getBinary memcpy cannot appear
    assert(p.contains("CoGroup"), p)
    // slab routing still keys on rating+shard (narrow ints), never text
    assert(p.contains("shard"), p)
    assert(!p.contains("bloom_might_contain"),
      "reload probe must not run the join-materialized expression form:\n" + p)
  }

  test("pipe3: the export composition carries every stage in one plan") {
    val p = plan("pipe3_export_corpus")
    assert(p.contains("hashed_lr_score"), "model gate must survive planning")
    assert(p.contains("xxhash64"), "dedup must key on the fingerprint")
    assert(p.contains("BroadcastHashJoin"), "rate table must broadcast")
    assert(p.contains("Window"), "shard emit order needs the window")
    // Measured choice (r6): the survivor (doc_id, source) relation is
    // cached so temperatureKeep's two references (rate aggregate +
    // corpus join) share ONE derivation of the text-bearing subtree —
    // without it the plan carried 10 hashed_lr_score evaluations and 20
    // corpus scans; with it, 5 (all inside the one cached build). The
    // wide text stages stay uncached on purpose: cache narrow,
    // recompute wide.
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "survivor relation must be cached")
    val nScore = "hashed_lr_score".r.findAllIn(p).length
    assert(nScore <= 5,
      s"model kernel appears $nScore times - survivor cache lost?")
  }

  test("pipe5: corpus-prep composition — scored pass cached and shared, " +
      "bench side broadcast, never a per-pair corpus plan") {
    // r16: the pack stage's range-exchange rebase (Ranks.withPrefixSums
    // materializes onto its own RDD) hides the upstream stages from the
    // composed query's queryExecution, so the stage shapes pin on the
    // pre-pack hook (the gr7/linkPredictionOver pattern)
    import org.apache.spark.sql.functions.col
    val docs = graft.operators.Tables(spark, dir, "documents")
    val bench = docs.where(col("doc_id") % 100 === 0)
    val (clean, scored, cl) = graft.operators.Dedup.corpusPrepStages(
      docs, bench, 0.5, 0.8, 3, 5)
    val p = clean.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // stage 1's tokenize+score relation is persisted: keep-best,
    // decontamination and packing all read the cache, not the parquet
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"the one tokenize+score pass must be cached and shared:\n$p")
    // the contamination stage's benchmark shingles broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"no per-pair corpus plan in the composition:\n$p")
    // the pre-pack plan re-reads raw documents parquet only for the
    // bounded benchmark branch — the corpus side comes from the cache
    val rawScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(rawScans <= 2, s"corpus must not be re-scanned per stage ($rawScans):\n$p")
    graft.CacheScope.release(graft.CacheScope.transfer(cl, clean))
    scored.unpersist(false)
    spark.catalog.clearCache()
  }

  test("pipe5/t8: the pack stage's running total is the distributed " +
      "prefix scan — broadcast offset joins, no unpartitioned window " +
      "(r16, VERDICT r15 ask #1)") {
    for (name <- Seq("pipe5_corpus_prep", "t8_pack_sequences")) {
      val p = plan(name)
      // the per-partition running-sum window partitions by pid; the
      // p-row offset relation broadcasts — a single-partition funnel
      // would surface as Exchange SinglePartition feeding the Window
      assert(!p.linesIterator.exists(l =>
          l.contains("Exchange") && l.contains("SinglePartition")),
        s"$name pack stage funnels through one partition:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$name must join the p-row offsets via broadcast:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("e15: both half rankings run window-free (the Ranks range-exchange " +
      "path) and the offset relations broadcast") {
    val p = plan("e15_segment_migration")
    assert(!p.contains("Window"),
      s"segment migration must not fall back to a global window:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("a20: the bounded fence relation broadcasts back onto the scan; " +
      "no window, no sort-merge") {
    val p = plan("a20_iqr_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), s"no window in the outlier count:\n$p")
  }

  test("t45/t46: the text screens are narrow projections — no join, " +
      "no aggregate beyond the output sort") {
    Seq("t45_readability", "t46_code_detect").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q must not aggregate:\n$p")
    }
  }

  test("mm9: video candidates meet through the frame-hash equi-join — " +
      "never a per-pair plan; exchanges carry (vid, hash), not text") {
    val p = plan("mm9_video_neardup")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"video dedup must stay hash-blocked:\n$p")
    val exchangesWithText = p.linesIterator.filter(_.contains("Exchange"))
      .count(_.contains("text"))
    assert(exchangesWithText === 0,
      s"no exchange may carry the text column:\n$p")
    // the staged frame-hash transform reads the rebased RDD leaves (the
    // repartition-before-transform + physical-px discipline): losing the
    // staging re-inlines the 63-substring decode and runs the whole lane
    // on the scan's single split (measured 33.8s vs 1.6s at sf0.1)
    assert(p.contains("Scan ExistingRDD"),
      s"frame hashing must stay staged on rebased RDDs:\n$p")
  }

  test("t16: model scoring is one projection — no explode, no join, no agg") {
    val p = plan("t16_hashed_lr")
    assert(p.contains("hashed_lr_score"), p)
    assert(!p.contains("Generate"), "kernel path must not explode tokens")
    assert(!p.contains("Join"), "kernel path must not join a weight table")
    assert(!p.contains("HashAggregate"), p)
  }

  test("p10: corpus side filters through a broadcast rate table, no corpus shuffle") {
    val p = plan("p10_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "the source-cardinality rate table must broadcast")
  }

  test("dedup_bloom_xbatch: NO exchange carries the text/key string column") {
    // the cross-batch verify join rides the dual-family fingerprint
    // (xxhash64 + seeded mmh3) — document text must be consumed by the
    // scan-side projections and never reach any exchange. Stricter than
    // the dedup_exact audit: here ALL exchanges must be string-free.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("dedup_bloom_xbatch")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val strs = e.child.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"string column(s) ${strs.map(_.name).mkString(",")} on the wire:\n" +
          e.child.schema.treeString)
    }
  }

  test("dedup_jaccard_exact / dedup_containment: no exchange carries a " +
      "string ARRAY — verify wires are 8-byte hash arrays (r16)") {
    // the r15 sweep read the per-candidate verify re-exchange at 956 MB
    // → 4.87 GB (sf1→sf5) carrying full shingle-string arrays; the
    // width-reduced form ships xxhash64 longs. Scalar strings remain
    // legitimate on the inverted-index build (one bounded row per
    // (doc, shingle), linear in the corpus) — only ARRAY-of-string,
    // the per-candidate payload, is banned from every shuffle.
    import org.apache.spark.sql.types.{ArrayType, StringType}
    for (name <- Seq("dedup_jaccard_exact", "dedup_containment")) {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      val exchanges = try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
      assert(exchanges.nonEmpty, name)
      exchanges.foreach { e =>
        val wide = e.child.schema.fields.filter(f => f.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        })
        assert(wide.isEmpty,
          s"$name ships string array(s) ${wide.map(_.name).mkString(",")}:\n" +
            e.child.schema.treeString)
      }
      spark.catalog.clearCache()
    }
  }

  test("dedup_snm: exchanges carry the bounded sort key, never document text") {
    // SNM's one shuffle is the window partitioning; it may carry the
    // 40-char sort key (bounded by construction) and lang/block, but the
    // unbounded text column must be consumed by the scan-side projection.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("dedup_snm")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val bad = e.child.schema.fields.filter(f => f.name == "text")
      assert(bad.isEmpty,
        s"document text on the wire:\n${e.child.schema.treeString}")
    }
  }

  test("t21: unigram-LM corpus total broadcasts; scan prunes to (doc_id, text)") {
    // the one-row corpus total must ride a broadcast nested-loop cross
    // join; the freq join is token-keyed by necessity (vocab-sized build
    // side), but nothing may sort-merge against the one-row total
    val p = plan("t21_unigram_lm")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("source"), s"scan must prune to (doc_id, text): $read")
  }

  test("sim_ann_sq8: no shuffle exchange carries the corpus embedding") {
    // the corpus assignment folds broadcast-centroid candidates with a
    // map-side-combining max_by, so the corpus-scale shuffle carries
    // (neighbor_id, centroid_id, sq8 binary) — the float embedding rides
    // only BROADCAST exchanges (centroids, queries, shortlist) and the
    // query-sized window exchange (column q_emb, |Q|-bounded). Forbid
    // the corpus-side column name on every shuffle.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("sim_ann_sq8")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val wide = e.child.schema.fields.filter(_.name == "embedding")
      assert(wide.isEmpty,
        s"corpus embedding on a shuffle:\n${e.child.schema.treeString}")
    }
  }

  test("sim_ann_ivfpq: only the explicit spread repartition ships the embedding") {
    // corpus assignment folds broadcast-centroid candidates with a
    // map-side max_by, so the float embedding crosses exactly ONE
    // shuffle — the documented local-bench repartition that spreads
    // encode+score work (dropped on a real cluster). Every other
    // exchange carries ids + codes (or |Q|-bounded query rows).
    // The query runs in its own child session, out of reach of a parent
    // AQE toggle — audit the pre-adaptive sparkPlan, where the exchanges
    // are visible regardless.
    val exchanges =
      SparkEntry.queries("sim_ann_ivfpq")(spark, dir)
        .queryExecution.sparkPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    assert(exchanges.nonEmpty)
    val wide = exchanges.filter(_.child.schema.fields.exists(_.name == "embedding"))
    assert(wide.size <= 1,
      s"${wide.size} exchanges carry the corpus embedding:\n" +
        wide.map(_.child.schema.treeString).mkString("\n"))
  }

  test("t19/t20: vocab-artifact queries broadcast the tiny side, never sort-merge") {
    // t19: the top-K vocab collapses to ONE array row broadcast behind a
    // nested-loop cross join; the corpus side must not shuffle for it
    val p19 = plan("t19_oov_rate")
    assert(p19.contains("BroadcastNestedLoopJoin") || p19.contains("BroadcastExchange"), p19)
    assert(!p19.contains("SortMergeJoin"), "vocab side must broadcast")
    val read19 = p19.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read19.contains("doc_id") && read19.contains("text") &&
      !read19.contains("source"), s"scan must prune to (doc_id, text): $read19")
    // t20: top-K by combined count plans as TakeOrdered, totals broadcast
    val p20 = plan("t20_token_drift")
    assert(p20.contains("TakeOrderedAndProject"), p20)
    assert(!p20.contains("SortMergeJoin"), "totals row must broadcast")
  }

  test("t18: calibration windows carry narrow rows, one output row per source") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.operators.Sampling.calibrateQuality(
          graft.operators.Tables(spark, dir, "documents"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    // the ranking window shuffles (doc_id, source, quality)-shaped rows;
    // the document text must be consumed by the scoring projection
    exchanges.foreach { e =>
      assert(!e.child.schema.fieldNames.contains("text"),
        s"document text on the wire: ${e.child.schema.treeString}")
    }
  }

  test("dedup_semantic: seeds broadcast; only the documented exchanges ship embeddings") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val planDf = SparkEntry.queries("dedup_semantic")(spark, dir)
    val (text, exchanges) = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val qe = planDf.queryExecution
      (qe.explainString(ExplainMode.fromString("formatted")),
        qe.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        })
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // the seed set rides a broadcast (nested-loop: no equi key), never a shuffle
    assert(text.contains("BroadcastNestedLoopJoin"), text)
    // embeddings legitimately cross the wire exactly twice (assignment
    // fold + the cluster-keyed pair join feeds); everything else —
    // removed-set distinct, kept-flag join, output sort — must be narrow
    val wide = exchanges.count(_.child.schema.fieldNames.exists(_.startsWith("emb")))
    assert(wide <= 3, s"embedding-carrying shuffles: $wide\n$text")
    assert(exchanges.size > wide, "narrow exchanges must exist (kept-flag/sort)")
  }

  test("t41_contamination: eval shingle set broadcasts; corpus never " +
      "self-joined") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val text = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("t41_contamination")(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // the corpus-scale branch: train shingles filtered by a BROADCAST
    // LeftSemi against the bounded eval set — never a shuffled semi-join
    assert(text.contains("BroadcastHashJoin") && text.contains("LeftSemi"),
      text)
    assert(!text.contains("SortMergeJoin"),
      s"corpus-side semi-join must not shuffle-sort the train corpus: $text")
    // exactly one scan branch reads the full documents table per side;
    // no self-join of the corpus on itself (every remaining join input
    // is bounded: eval shingles or the matched-shingle set)
    assert(!text.contains("CartesianProduct")
      && !text.contains("BroadcastNestedLoopJoin"), text)
  }

  test("t22_chunk: chunking is narrow — the only exchange is the output sort") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("t22_chunk")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.size === 1, s"expected only the orderBy range exchange")
    val p = plan("t22_chunk")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("p13_curriculum: the phase window sorts narrow rows, never text") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("p13_curriculum")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.child.schema.fieldNames.contains("text"),
        s"document text on the curriculum sort: ${e.child.schema.treeString}")
    }
  }

  test("t23_bpe_pairs: the corpus pass ends at word counts; pairs expand over the vocabulary") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("t23_bpe_pairs")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // every exchange carries word/pair-shaped rows, never document text,
    // and the word-count aggregate must partial (map-side combine) before
    // its shuffle
    exchanges.foreach { e =>
      assert(!e.child.schema.fieldNames.contains("text"),
        s"document text on a BPE exchange: ${e.child.schema.treeString}")
    }
    val p = plan("t23_bpe_pairs")
    assert(p.contains("partial_count") || p.contains("partial count")
      || p.contains("Partial"), p)
  }

  test("t24_bigram_lm / t25_dsir: LM exchanges carry words and counts, never text") {
    for (q <- Seq("t24_bigram_lm", "t25_dsir")) {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      val exchanges = try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
      assert(exchanges.nonEmpty, q)
      exchanges.foreach { e =>
        val fields = e.child.schema.fieldNames
        assert(!fields.contains("text") && !fields.contains("toks"),
          s"$q ships text/token arrays: ${e.child.schema.treeString}")
      }
    }
  }

  test("pipe4_dsir_select: selection and sharding never put text back on the wire") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("pipe4_dsir_select")(spark, dir)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val fields = e.child.schema.fieldNames
      assert(!fields.contains("text") && !fields.contains("toks"),
        s"pipe4 ships text/token arrays: ${e.child.schema.treeString}")
    }
  }

  test("k9_zorder: distributed ntile — broadcast offset joins, no window, " +
      "a 16-group aggregate") {
    val p = plan("k9_zorder")
    // r9: the three ntile windows became Ranks.withGlobalNtile (range
    // exchange + local sort + broadcast offset join) — no Window node,
    // no single-partition funnel, and the p-row offset relations must
    // broadcast, never shuffle-sort
    assert(!p.contains("Window"), s"global window back in the manifest:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"offset joins must broadcast:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    spark.catalog.clearCache() // withGlobalRank persists its sorted input
  }

  test("layout/curriculum lane: no full-table global-window exchange " +
      "(k9/k10/k11/p13/pipe4 — the r8 weak set)") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // these five registered plans funneled every row through ONE task in
    // r8 (ntile/row_number over an unpartitioned Window). The scale-safe
    // rewrite must leave NO window with an empty partition spec anywhere
    // in their physical plans; per-key windows (pipe4's per-shard pos)
    // remain legitimate.
    for (name <- Seq("k9_zorder", "k10_hilbert", "k11_skip_stats",
        "p13_curriculum", "pipe4_dsir_select")) {
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      // deepCollect, not collect: AQE wrappers are leaves to plain
      // traversal, which made this assertion vacuous as first written
      val global = deepCollect(exec) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$name still carries a full-table global window:\n${global.mkString("\n")}")
      spark.catalog.clearCache()
    }
  }

  test("no unpartitioned window over an unbounded relation anywhere in " +
      "the corpus-scale lanes (r16 rule — VERDICT r15 ask #1)") {
    // The codified form of the r15 audit finding: an unpartitioned
    // WindowExec is sanctioned ONLY when its input is bounded by a limit
    // (TakeOrderedAndProject / GlobalLimit / CollectLimit — the gr7/p14
    // top-k-then-rank pattern) or is a local relation. Anything else is
    // a single-reducer funnel at 100 TB, whatever sf0.1 timing says.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
      LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
    def bounded(p: SparkPlan): Boolean =
      deepCollect(p) {
        case _: TakeOrderedAndProjectExec => ()
        case _: GlobalLimitExec => ()
        case _: CollectLimitExec => ()
        case _: LocalTableScanExec => ()
      }.nonEmpty
    for (name <- Seq("pipe1_clean_corpus", "pipe2_pretrain_corpus",
        "pipe5_corpus_prep", "t8_pack_sequences", "t8_pack_sharded",
        "t13_bm25", "sim_rrf_fusion", "dedup_keep_best",
        "dedup_span_rate")) {
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val offenders = deepCollect(exec) {
        case w: WindowExec
            if w.partitionSpec.isEmpty && !bounded(w.child) => w
        case w: WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }
      assert(offenders.isEmpty,
        s"$name runs an unpartitioned window over an unbounded relation:\n" +
          offenders.mkString("\n"))
      spark.catalog.clearCache()
    }
  }

  // gr7's registered query finalizes to a bounded local relation (the
  // operator collects topK rows and releases its caches before return —
  // r9 ask #6), so the audits pin the DISTRIBUTED plan it executes via
  // the internal linkPredictionOver hook.
  private def gr7Plan: String = {
    val events = graft.operators.Tables(spark, dir, "events")
    graft.operators.Graph
      .linkPredictionOver(graft.operators.Graph.undirected(events), 20)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("gr7: the top-k plans as TakeOrderedAndProject; the rank window " +
      "runs over the bounded topK rows") {
    val p = gr7Plan
    // the p14 pattern (r8 verdict ask #4): each task keeps a topK heap
    // (TakeOrderedAndProject), so the only unpartitioned window in the
    // plan sees at most topK rows — never the full candidate relation.
    // (InferWindowGroupLimit does not fire on an unpartitioned window,
    // so the rank-filter form was a genuine funnel.)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("WindowGroupLimit"), p)
  }

  test("gr4/gr7: wedge joins stay equi-keyed — never a per-pair plan") {
    for (name <- Seq("gr4_neighbor_jaccard", "gr7_link_pred")) {
      val p = if (name == "gr7_link_pred") gr7Plan else plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(nodeCount(p, "BroadcastNestedLoopJoin") === 0,
        s"$name wedge/anti joins must not nested-loop:\n$p")
      val equiJoins = nodeCount(p, "SortMergeJoin") +
        nodeCount(p, "ShuffledHashJoin") + nodeCount(p, "BroadcastHashJoin")
      assert(equiJoins >= 2, s"$name wedge joins must ride equi-joins:\n$p")
    }
  }

  test("dedup_passage: the keeper exchange carries bounded-width rows only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.operators.Dedup.passageDedup(
          graft.operators.Tables(spark, dir, "documents"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(exchanges.nonEmpty)
    // every shuffled string column is a passage (bounded by w tokens) —
    // the full document text column must never reach an exchange
    exchanges.foreach { e =>
      assert(!e.child.schema.fieldNames.contains("text"),
        s"document text on the wire: ${e.child.schema.treeString}")
    }
  }

  test("p14: the weighted draw is a TakeOrdered top-k, not a global sort") {
    val p = plan("p14_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the rank window runs AFTER the limit, on k collected rows — the
    // single-partition window must never see the corpus side
    assert(p.indexOf("TakeOrderedAndProject") > p.indexOf("Window"),
      "window must sit above the top-k in the formatted plan")
  }

  test("p15: rank filter inserts WindowGroupLimit — map-side top-k pruning") {
    val p = plan("p15_stratified_es")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("a14: the pair table broadcasts into the hash relation, never the reverse") {
    val p = plan("a14_kmv_jaccard")
    // BuildRight = the pairs relation (the join's right side) is what
    // ships; the corpus-sized hash relation streams through
    assert(p.contains("BroadcastNestedLoopJoin Inner BuildRight"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a15: equi-depth bucketing is a projection — no ntile, no join") {
    // the naive formulation (global ntile window) would single-partition
    // the whole table; the boundary-artifact formulation must plan as a
    // comparison-sum projection feeding one aggregate
    val p = plan("a15_equidepth_hist")
    assert(!p.contains("ntile"), "no global ntile window:\n" + p)
    assert(!p.contains("Join"), "bucketing must not join:\n" + p)
    assert(nodeCount(p, "Window") === 0, "no window operator:\n" + p)
  }

  test("a15 gate: depth check is two stacked aggregates — no join, no window") {
    val p = plan("a15_depth_verify")
    assert(!p.contains("Join"), "gate must not join:\n" + p)
    assert(nodeCount(p, "Window") === 0, "no window operator:\n" + p)
    assert(nodeCount(p, "Scan parquet") === 1, "one scan:\n" + p)
  }

  test("a15 boundaries: sketch aggregate, never a single-group exact percentile") {
    // the boundary artifact must come from the mergeable approx sketch
    // (ObjectHashAggregate partial/final); an exact percentile would
    // funnel every value of the column into one final buffer
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), p)
    // every percentile in the plan must be the approx sketch form
    assert(!p.toLowerCase.replace("approx_percentile(", "")
        .contains("percentile("),
      "exact percentile banned:\n" + p)
    assert(nodeCount(p, "Sort") === 0, "no sort:\n" + p)
  }

  test("e6: hopping windows expand in-scan — no self-join, 4x explode") {
    val p = plan("e6_sliding")
    assert(p.contains("Expand") || p.contains("Generate"),
      "the 4 hop assignments must come from an explode/expand:\n" + p)
    assert(!p.contains("Join"), "hop assignment must not self-join:\n" + p)
    assert(nodeCount(p, "Scan parquet") === 1, "one scan:\n" + p)
  }

  test("t30: KN model relations stay word-keyed; candidates never rescan text") {
    val p = plan("t30_kneser_ney")
    // four model lookups (bi, ctx, cont, B) + the candidate relation all
    // derive from tokenized slices; no exchange may carry the text column
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text")),
      "no exchange carries document text:\n" + p)
  }

  test("j10: interval lookup keeps the user_id equi-key — never a nested loop") {
    val p = plan("j10_interval_lookup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      "interval predicate must ride an equi-join as a residual:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), p)
  }

  test("d4: the MV merge is two partial aggregates union-merged, one scan each") {
    val p = plan("d4_incremental_mv")
    // base + delta slices each scan+aggregate, the merge re-aggregates by
    // key — no join anywhere in the maintenance path
    assert(!p.contains("Join"), "MV merge must not join:\n" + p)
    assert(p.contains("Union"), p)
  }

  test("w6: both EWMA windows share one user_id exchange; no join") {
    val p = plan("w6_ewma")
    assert(!p.contains("Join"), p)
    // recency filter + sequence + cumulative windows, plus the final
    // presentation sort: at most the keyed exchange and the sort
    assert(nodeCount(p, "Exchange") <= 2,
      s"EWMA must not re-shuffle between its windows:\n$p")
  }

  test("e7: dynamic-gap sessions plan as MergingSessions, not a self-join") {
    val p = plan("e7_dynamic_sessions")
    assert(p.contains("MergingSessions") || p.contains("Session"),
      "dynamic gap must still ride the session-merge operator:\n" + p)
    assert(!p.contains("Join"), p)
  }

  test("gr2: triangle wedge joins stay equi-keyed — never a per-pair plan") {
    val p = plan("gr2_triangles")
    // the census stitches three ONE-ROW aggregates with scalar
    // cross-joins (the repo's bounded-broadcast contract) — those plan as
    // BroadcastNestedLoopJoin over single-row sides and are sanctioned;
    // the edge-shaped wedge joins must be equi-joins and nothing may
    // degenerate into an unbounded cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(nodeCount(p, "BroadcastNestedLoopJoin") <= 2,
      s"only the two one-row census stitches may nested-loop:\n$p")
    val equiJoins = nodeCount(p, "SortMergeJoin") +
      nodeCount(p, "ShuffledHashJoin") + nodeCount(p, "BroadcastHashJoin")
    assert(equiJoins >= 2, s"wedge joins must ride equi-joins:\n$p")
  }

  test("gr1: the edge window partitions by hour bucket, never globally") {
    val p = plan("gr1_degrees")
    // a global lead() would surface as a single-partition Exchange
    // (SinglePartition) feeding the Window — the 100 TB funnel the edge
    // contract exists to avoid
    val windowExchanges = p.linesIterator.filter(l =>
      l.contains("Exchange") && l.contains("SinglePartition")).toSeq
    assert(windowExchanges.isEmpty,
      s"edge derivation must not serialize through one partition:\n$p")
  }

  test("e9: attribution is one per-user window pass — no touch self-join") {
    val p = plan("e9_attribution")
    // the naive formulation joins purchases against the touch-event set
    // per row; the carried-last-touch window must keep the plan join-free
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("d5: CDC merge is one full-outer equi-join over two reductions") {
    val p = plan("d5_merge_cdc")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both sides must reduce BEFORE the merge join: partial max_by
    // aggregates upstream shrink each side to one row per key
    assert(nodeCount(p, "HashAggregate") +
      nodeCount(p, "SortAggregate") +
      nodeCount(p, "ObjectHashAggregate") >= 4, // 2 sides × partial+final
      s"changelog sides must pre-reduce per key:\n$p")
  }

  test("p17: consistent sample pre-prunes per task via WindowGroupLimit") {
    val p = plan("p17_consistent_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push a per-task group limit below the exchange:\n$p")
  }

  test("priv1: the whole ladder reads customer ONCE via a pre-agg explode") {
    val p = plan("priv1_k_anonymity")
    assert(nodeCount(p, "Scan parquet") === 1,
      s"one scan must feed every ladder rung:\n$p")
    assert(p.contains("Generate"), // the explode sits below the aggregate
      s"rung widths must fan out inside the map task:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("priv2 gate: seeded-noise re-derivation joins on the group key, " +
      "no cartesian") {
    val p = plan("priv2_verify")
    // r9: the measured-group-count bound arrives as a ONE-ROW scalar
    // cross-join (the gr2 census pattern) — sanctioned; the exact/released
    // count join itself must stay an equi-join on the group key
    assert(!p.contains("CartesianProduct"),
      s"exact and released counts must equi-join on c_mktsegment:\n$p")
    assert(nodeCount(p, "BroadcastNestedLoopJoin") <= 1,
      s"only the one-row bound stitch may nested-loop:\n$p")
    assert(nodeCount(p, "SortMergeJoin") + nodeCount(p, "ShuffledHashJoin")
      + nodeCount(p, "BroadcastHashJoin") >= 1,
      s"the group-key join degenerated:\n$p")
  }

  test("sim_mmr: candidates pre-prune per task; greedy is one MapGroups " +
      "over a single exchange") {
    val p = plan("sim_mmr_rerank")
    // top-n candidate generation must keep bruteForceTopK's per-task
    // WindowGroupLimit prune (the greedy never sees the corpus)
    assert(p.contains("WindowGroupLimit"), p)
    assert(nodeCount(p, "MapGroups") === 1, p)
    // exactly one BNLJ: the brute-force baseline's broadcast query probe
    // (the documented exact-candidate face; ANN paths substitute at scale)
    assert(nodeCount(p, "BroadcastNestedLoopJoin") <= 1, p)
  }

  test("a17: referential integrity is a LEFT ANTI equi-join, " +
      "never a cartesian") {
    val p = plan("a17_expectations")
    assert(p.contains("LeftAnti"), s"FK rule must plan as anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d6: snapshot diff pre-reduces both states per key before ONE " +
      "outer equi-join") {
    val p = plan("d6_snapshot_diff")
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both snapshots reduce per key upstream (max_by partial+final each)
    assert(nodeCount(p, "HashAggregate") + nodeCount(p, "SortAggregate")
      + nodeCount(p, "ObjectHashAggregate") >= 4,
      s"latest-wins states must pre-reduce per key:\n$p")
  }

  test("w8: rolling median is ONE window pass over the user partition") {
    val p = plan("w8_rolling_median")
    assert(nodeCount(p, "Window") === 1,
      s"the frame collect and the median projection must share a pass:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("sim_rrf: fusion joins two bounded top-k relations, no " +
      "corpus-sized exchange after the rankers") {
    val p = plan("sim_rrf_fusion")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // both rankers bound their lists per task before the fusion join
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("dedup_fuzzy_names: candidates meet through the blocking equi-join " +
      "and the native kernel survives into the plan") {
    val p = plan("dedup_fuzzy_names")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy matching must never degenerate to all-pairs:\n$p")
    assert(p.contains("jaro_winkler"),
      s"the codegen kernel must not be replaced by a fallback:\n$p")
  }

  test("fe2: item supports and the order count broadcast onto the " +
      "pair-keyed aggregate") {
    val p = plan("fe2_assoc_rules")
    assert(!p.contains("CartesianProduct"), p)
    // two bounded item-count relations + the one-row order count
    assert(nodeCount(p, "BroadcastHashJoin") +
      nodeCount(p, "BroadcastNestedLoopJoin") >= 3, p)
  }

  test("t36: the NB model and label constants broadcast; the argmax " +
      "window partitions by doc, never globally") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("t36_nb_classify")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, s"per-doc argmax went global:\n${global.mkString("\n")}")
    assert(deepCollect(exec) { case w: WindowExec => w }.nonEmpty,
      s"expected the per-doc argmax window in the plan:\n$exec")
    val p = plan("t36_nb_classify")
    assert(nodeCount(p, "BroadcastHashJoin") >= 2,
      s"model cells and per-label constants are bounded artifacts and " +
        s"must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gr8: the returned PPR relation reads the cached final rank — " +
      "no parquet rescan, no recomputed edge derivation") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val exec = SparkEntry.queries("gr8_ppr")(spark, dir)
      .queryExecution.executedPlan
    // deepCollect stops at InMemoryTableScan (cached subtrees run once at
    // materialization), so any FileSourceScan here is a REAL recompute
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
      s"final PPR rank must come from the cached relation:\n$exec")
    assert(deepCollect(exec) { case s: InMemoryTableScanExec => s }.nonEmpty,
      s"expected the persisted rank relation:\n$exec")
    spark.catalog.clearCache()
  }

  test("fe5/fe6/fe3: one fact scan; totals derive from the persisted " +
      "bounded count relation") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    for (name <- Seq("fe5_psi_drift", "fe6_woe_iv", "fe3_benford")) {
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
        s"$name must not rescan the fact table for its totals:\n$exec")
      assert(deepCollect(exec) { case s: InMemoryTableScanExec => s }.size === 2,
        s"$name: counts + totals must share the cached relation:\n$exec")
      spark.catalog.clearCache()
    }
  }

  test("fe7/fe8/priv4: margins derive from the persisted cell relation " +
      "and the bounded joins broadcast") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    for (name <- Seq("fe7_chi2", "fe8_mutual_info", "priv4_t_closeness")) {
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      // the fact scan lives INSIDE the cached cell relation: cell + two
      // margins + total = 4 cache reads, parquet never at the top level
      assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
        s"$name must not rescan the fact table for its margins:\n$exec")
      assert(deepCollect(exec) { case s: InMemoryTableScanExec => s }.size === 4,
        s"$name: cell + margins + total must share the cached cells:\n$exec")
      assert(deepCollect(exec) { case j: SortMergeJoinExec => j }.isEmpty,
        s"$name: bounded margin joins must broadcast:\n$exec")
      spark.catalog.clearCache()
    }
  }

  test("fe9/t38: single-aggregate regression shapes — one scan for all " +
      "sums, no global window") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // fe9: the six output rows are projections of the ONE cached sums row
    val fe9 = SparkEntry.queries("fe9_corr_matrix")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(fe9) { case s: FileSourceScanExec => s }.isEmpty,
      s"fe9 must not rescan lineitem per pair:\n$fe9")
    assert(deepCollect(fe9) { case s: InMemoryTableScanExec => s }.size === 6,
      s"fe9: the six pair rows must share the cached sums row:\n$fe9")
    spark.catalog.clearCache()
    // t38: the global rank rides Ranks.withGlobalRank — no unpartitioned
    // window anywhere (the k9-k11 de-funnel contract)
    val t38 = SparkEntry.queries("t38_zipf")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(t38) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, s"t38 carries a global window:\n$global")
    spark.catalog.clearCache()
  }

  test("fe4: the fact table shuffles once; every higher aggregate " +
      "derives from the persisted cell relation") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val exec = SparkEntry.queries("fe4_cv_target_encode")(spark, dir)
      .queryExecution.executedPlan
    // the fact join + groupBy live INSIDE the cached cell relation; the
    // top-level plan must read that cache 4 times and parquet never
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
      s"cv encoding must not rescan the fact table per aggregate:\n$exec")
    assert(deepCollect(exec) { case s: InMemoryTableScanExec => s }.size === 4,
      s"expected cell + seg + fld + tot to share the cached cells:\n$exec")
    assert(deepCollect(exec) { case j: SortMergeJoinExec => j }.isEmpty,
      s"cell-relation joins are bounded and must broadcast:\n$exec")
    spark.catalog.clearCache()
  }

  test("t40: retrieval candidates meet through the term-keyed postings " +
      "join, never all-pairs; the top-k window partitions by query") {
    import org.apache.spark.sql.execution.window.WindowExec
    val p = plan("t40_tfidf_retrieval")
    assert(!p.contains("CartesianProduct"),
      s"sparse retrieval must never degenerate to all-pairs:\n$p")
    val exec = SparkEntry.queries("t40_tfidf_retrieval")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, s"per-query top-k went global:\n${global.mkString("\n")}")
  }

  test("fe12: the exact ntile binning carries no window at all " +
      "(range exchange + broadcast offsets), and no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("fe12_woe_ntile")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
      "the distributed ntile must not plan a WindowExec")
    spark.catalog.clearCache()
  }

  test("fe13: one scan computes all VIF co-moments; the three feature " +
      "rows share the cached sums row") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val exec = SparkEntry.queries("fe13_vif")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
      s"VIF must not rescan lineitem per output row:\n$exec")
    assert(deepCollect(exec) { case s: InMemoryTableScanExec => s }.size === 3,
      s"the three feature rows must share the cached sums row:\n$exec")
    spark.catalog.clearCache()
  }

  test("mm7: the aHash window partitions by hash, never globally") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("mm7_ahash")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"bucket sizing must partition by ahash:\n${global.mkString("\n")}")
  }

  test("w12/e11: per-type stats broadcast back onto the scan") {
    val pw = plan("w12_mad_anomaly")
    assert(!pw.contains("SortMergeJoin"),
      s"bounded per-type stats must broadcast:\n$pw")
    val pe = plan("e11_seasonality")
    assert(!pe.contains("SortMergeJoin"),
      s"bounded margins must broadcast:\n$pe")
    assert(!pe.contains("CartesianProduct"), pe)
  }

  test("w13: the CUSUM windows partition by event_type over bounded " +
      "cells; per-type stats broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("w13_cusum")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"CUSUM windows must partition by type:\n${global.mkString("\n")}")
    val p = plan("w13_cusum")
    assert(!p.contains("SortMergeJoin"),
      s"bounded per-type stats must broadcast:\n$p")
  }

  test("t42: novelty attribution is aggregate-only — no window, no " +
      "self-join of the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("t42_ngram_novelty")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
      "first-occurrence must come from a min aggregate, not a window")
    val p = plan("t42_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("e12: uplift is ONE distinct-counting aggregate over one scan; " +
      "no join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val exec = SparkEntry.queries("e12_holdout_lift")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.size === 1,
      s"one events scan expected:\n$exec")
    val p = plan("e12_holdout_lift")
    assert(!p.contains("Join"), s"closed-form z joins nothing:\n$p")
  }

  test("priv5: entropy l-diversity is aggregate-only over bounded " +
      "cells — no join, no window") {
    val p = plan("priv5_l_diversity")
    assert(!p.contains("Join"), s"two chained aggregates join nothing:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("fe15/e13: the rank-backed lanes carry no window at all and " +
      "broadcast their offset relations — never a sort-merge join") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (name <- Seq("fe15_gini", "e13_rfm")) {
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
        s"$name: the distributed rank replaces every window")
      val p = plan(name)
      assert(!p.contains("SortMergeJoin"),
        s"$name: the p-row offset relation must broadcast:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("fe17: partial correlations ride the ONE persisted sum relation; " +
      "no window, no shuffle-sort join") {
    val p = plan("fe17_partial_corr")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"the three rows must project the persisted one-row sums:\n$p")
    spark.catalog.clearCache()
  }

  test("gr14: reciprocity joins edges to their reversal as an " +
      "edge-keyed semi-join; the two scalars cross as broadcasts") {
    val p = plan("gr14_reciprocity")
    assert(!p.contains("SortMergeJoin") || p.contains("LeftSemi"),
      s"the reversal probe must be the semi-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"one-row scalars must broadcast-cross:\n$p")
    spark.catalog.clearCache()
  }

  test("w14: the MK pair relation is a type-keyed equi-join over the " +
      "bounded hourly cells — no cartesian, no window at all") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("w14_mann_kendall")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
      "MK is aggregate-only: sign folds + exact percentile")
    val p = plan("w14_mann_kendall")
    assert(!p.contains("CartesianProduct"),
      s"hour pairs must come from the event_type equi-join:\n$p")
    spark.catalog.clearCache()
  }

  test("t44: RAKE windows partition by document (never global); the " +
      "word-stats join is token-keyed, the head is TakeOrdered") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("t44_rake")(spark, dir)
      .queryExecution.executedPlan
    val global = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"segmentation windows must partition by doc:\n${global.mkString("\n")}")
    val p = plan("t44_rake")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k head must not global-sort:\n$p")
    spark.catalog.clearCache()
  }

  test("a19: the moment profile is ONE scan, one bounded aggregate — " +
      "no join, no window") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val exec = SparkEntry.queries("a19_moments")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.size === 1,
      s"all four power sums must ride ONE orders scan:\n$exec")
    val p = plan("a19_moments")
    assert(!p.contains("Join"), s"closed forms join nothing:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("t43: the JS pair join is token-keyed (no cartesian), totals " +
      "broadcast, no window") {
    val p = plan("t43_js_domains")
    assert(!p.contains("CartesianProduct"),
      s"pairs must come from the token-keyed equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-source totals must broadcast:\n$p")
    assert(!p.contains("Window"), p)
    spark.catalog.clearCache()
  }

  test("mm8: the DCT hash is a shuffle-free projection; only the " +
      "hash-keyed bucket window exchanges, carrying (doc_id, phash)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("mm8_phash")(spark, dir)
      .queryExecution.executedPlan
    val wins = deepCollect(exec) { case w: WindowExec => w }
    assert(wins.size === 1 && wins.head.partitionSpec.nonEmpty,
      s"exactly the phash-partitioned bucket window expected:\n$exec")
    val p = plan("mm8_phash")
    assert(!p.contains("Join"), s"the transform joins nothing:\n$p")
    // the stages are pinned behind RDD re-bases (see Multimodal.pHash:
    // CollapseProject would re-run the pixel decode 63×64 times per row)
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD"),
      s"the staged array columns must be physically pinned:\n$p")
  }

  test("e14: KM windows run over the bounded lifetime grid (post-" +
      "aggregation), and the horizon joins as a one-row broadcast") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val exec = SparkEntry.queries("e14_survival")(spark, dir)
      .queryExecution.executedPlan
    // every window's subtree must contain the duration-grid aggregate —
    // i.e. windows consume CELLS, never customer- or order-scaled rows
    val wins = deepCollect(exec) { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(deepCollect(w.child) { case a: BaseAggregateExec => a }.nonEmpty,
        s"KM window must sit above the bounded cell aggregate:\n$w")
    }
    val p = plan("e14_survival")
    assert(!p.contains("SortMergeJoin"),
      s"the one-row horizon must broadcast:\n$p")
    // the horizon and the cells consume the PERSISTED per-customer
    // relation — both scans sit behind InMemoryTableScan (which
    // deepCollect deliberately does not descend into: the cached
    // fragment executes once), so no un-cached orders scan may remain
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.isEmpty,
      s"orders must be read through the shared persisted relation:\n$exec")
    spark.catalog.clearCache()
  }

  test("fe16: the pivoted ANOVA is ONE scan of orders with no join " +
      "and no window") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("fe16_anova")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.size === 1,
      s"all 11 conditional aggregates must ride ONE orders scan:\n$exec")
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty, s"$exec")
    val p = plan("fe16_anova")
    assert(!p.contains("Join"), s"a one-row closed form joins nothing:\n$p")
  }

  test("fe14: one scan feeds all five PCA co-moments; no window, " +
      "no join at all") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("fe14_pca2")(spark, dir)
      .queryExecution.executedPlan
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.size === 1,
      s"PCA co-moments must come from ONE lineitem scan:\n$exec")
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty, s"$exec")
    val p = plan("fe14_pca2")
    assert(!p.contains("Join"), s"a one-row closed form joins nothing:\n$p")
  }

  test("mm10: the band-energy fold is staged (pinned arrays, spread " +
      "exchange); landmark windows partition by track; the pair join " +
      "is fp-keyed, never cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val exec = SparkEntry.queries("mm10_audio_fp")(spark, dir)
      .queryExecution.executedPlan
    // the landmark relation (and its track-partitioned lead() window)
    // lives behind the persist — the final plan must consume it through
    // the cache, and any window that DOES survive outside the cache must
    // be track-partitioned, never global
    assert(exec.toString.contains("InMemoryTableScan"),
      s"both pair-join sides must read the persisted landmarks:\n$exec")
    val wins = deepCollect(exec) { case w: WindowExec => w }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"no global window may surface in the pair phase:\n$exec")
    assert(deepCollect(exec) { case c: CartesianProductExec => c }.isEmpty,
      s"the candidate join must stay fp-keyed:\n$exec")
    val p = plan("mm10_audio_fp")
    // Staging.pin: the energy array must be physically pinned, or
    // CollapseProject re-runs the 4×8 substring fold per reference
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD"),
      s"the staged energy column must be physically pinned:\n$p")
    spark.catalog.clearCache()
  }

  test("gr15: each round's stats are node/edge-keyed aggregates; no " +
      "global window, no cartesian anywhere in the trajectory") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    // modularity runs its jobs eagerly (one summary row per round); the
    // audit inspects the RESULT's plan shape and the absence of funnel
    // operators in the constituent round queries via the public face
    val df = SparkEntry.queries("gr15_modularity")(spark, dir)
    val exec = df.queryExecution.executedPlan
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
      s"the trajectory is a bounded local relation:\n$exec")
    assert(deepCollect(exec) { case c: CartesianProductExec => c }.isEmpty)
    val rows = df.collect()
    assert(rows.length === 4)
    spark.catalog.clearCache()
  }

  test("p19: the mixture planner is ONE corpus scan (persisted rollup) " +
      "with broadcast stitches of the one-row totals") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("p19_domain_mix")(spark, dir)
      .queryExecution.executedPlan
    // the per-source rollup persists; totals and the final projection
    // both read the cache — no second documents scan survives
    assert(deepCollect(exec) { case s: FileSourceScanExec => s }.size <= 1,
      s"the k-row rollup must be computed from ONE corpus scan:\n$exec")
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty, s"$exec")
    val p = plan("p19_domain_mix")
    assert(!p.contains("SortMergeJoin"),
      s"one-row totals must broadcast:\n$p")
    spark.catalog.clearCache()
  }
}
