package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{BloomFilter, GroupFilters}
import graft.functions.{bloom_build_native, bloom_might_contain, bloom_probe_groups}

/** The reference's 4-stage pipeline (SURVEY.md §0) re-expressed as three
  * composable DataFrame functions (the split lives in [[Ratings]]):
  *
  * {{{
  * ratings --(linecount)--> (rating, n)                     // sizing stats
  * train + sizes --(buildFilters)--> (rating, n, m, k, bits)
  * test + filters --(fpStats)--> (rating, falsePositives, total, fpRate)
  * }}}
  *
  * Scale design: the sizing pass is a partial+final hash aggregate (tiny
  * result: one row per group); geometry joins back to the fact rows via
  * broadcast (no shuffle of the big side); the build is one shuffle of
  * pre-merged m-bit buffers; the probe broadcasts the filters (a few rows)
  * and keeps the predicate inside codegen; the final stats are another
  * partial+final aggregate. Total: exactly two shuffles of small data at
  * any input scale.
  */
object BloomPipeline {

  /** Stage 1 — reference job `count-number-of-keys.py:33-38` (A1). */
  def linecount(ratings: DataFrame): DataFrame =
    ratings.groupBy("rating").agg(count("*").as("n"))

  /** Per-group geometry from counts: m = ceil(-n ln p / ln^2 2), constant
    * k = ceil(-ln p / ln 2) — identical arithmetic to
    * [[graft.core.BloomFilter.numBits]] so driver-side and SQL-side sizing
    * agree bit-for-bit, including the Int.MaxValue-8 upper clamp (without
    * it the cast overflows under ANSI for groups of ~>496M keys at p=0.05;
    * groups that large should use [[shardedFilters]] instead, which has no
    * per-slab limit). */
  def sized(counts: DataFrame, p: Double): DataFrame = {
    val bitsPerKey = -math.log(p) / (math.log(2) * math.log(2))
    counts
      .withColumn("m",
        least(lit(Int.MaxValue.toLong - 8),
          greatest(lit(1L), ceil(col("n") * bitsPerKey))).cast("int"))
      .withColumn("k", lit(BloomFilter.numHashes(p)))
  }

  /** Sizing from an HLL sketch instead of exact counts (the substitution
    * SURVEY.md §2.4 flags: the reference's linecount is an exact
    * cardinality pass used exactly where `approx_count_distinct` fits).
    * At 100 TB the exact pass shuffles nothing either way (partial aggs),
    * but the approx pass also dedupes keys — sizing by *distinct* keys,
    * which is what a Bloom filter actually holds — at fixed sketch memory.
    * `headroom` compensates the sketch's relative standard deviation so
    * undersizing (FPP above p) is improbable; zero-FN is unaffected by
    * sizing either way. */
  def sizedApprox(train: DataFrame, p: Double, rsd: Double = 0.05): DataFrame = {
    val headroom = 1.0 + 2.0 * rsd
    val counts = train.groupBy("rating")
      .agg(approx_count_distinct(col("movieId"), rsd).as("n_est"))
      .withColumn("n", ceil(col("n_est") * headroom).cast("bigint"))
      .drop("n_est")
    sized(counts, p)
  }

  /** [[buildFilters]] with approx sizing — one pass fewer of exact-count
    * state, same zero-FN contract, FPP ≤ ~p with high probability. */
  def buildFiltersApprox(train: DataFrame, p: Double, rsd: Double = 0.05): DataFrame = {
    val geometry = sizedApprox(train, p, rsd)
    train
      .join(broadcast(geometry), "rating")
      .groupBy("rating", "n", "m", "k")
      .agg(bloom_build_native(col("movieId"), col("m"), col("k")).as("bits"))
  }

  /** Stage 2 — reference builder (`bloomfilters_builder.py:87-100`,
    * `builder/BloomFilterReducer.java:46-94`). Output one row per group:
    * (rating, n, m, k, bits).
    */
  def buildFilters(train: DataFrame, p: Double): DataFrame = {
    // the build is a double pass over train (sizing agg, then the filter
    // agg) and most callers probe the same DataFrame again — cache the
    // shared subtree once instead of re-running its parse per pass.
    // Cache-lifetime contract: the persist lives until the caller releases
    // it (`train.unpersist()` / `spark.catalog.clearCache()`); Bench and
    // Verify clear between queries so nothing is measured warm.
    train.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val geometry = sized(linecount(train), p)
    train
      .join(broadcast(geometry), "rating")
      .groupBy("rating", "n", "m", "k") // n/m/k functionally determined by rating
      .agg(bloom_build_native(col("movieId"), col("m"), col("k")).as("bits"))
  }

  /** Stage 3 — reference tester (`bloomfilters_tester.py:94-112`,
    * `tester/ReducerTester.java:49-118`): probe each test row against its
    * group's filter, count false positives. Because train/test keys are
    * disjoint, every hit is a false positive (SURVEY.md §5.1).
    *
    * Join formulation (J1 + P3 + A4 decomposition): Catalyst picks the
    * join strategy and the probe predicate stays in codegen. Its cost
    * profile carries one hidden term: the joined BINARY `bits` attribute
    * is materialized per probe row (~m/8 bytes of memcpy each), so the
    * production unsharded probe is [[fpStatsCollected]]; this formulation
    * is the right one when the filter side is too large to collect but
    * small enough to broadcast-join.
    *
    * Edge policy (SURVEY.md §2.6, deliberate fix): a test rating with no
    * built filter is *skipped* via the inner join (the Hadoop engine
    * logged-and-dropped; the reference Spark engine crashed).
    */
  def fpStats(test: DataFrame, filters: DataFrame): DataFrame =
    test
      .join(broadcast(filters.select("rating", "m", "k", "bits")), "rating")
      .select(col("rating"),
        bloom_might_contain(col("bits"), col("m"), col("k"), col("movieId")).as("hit"))
      .groupBy("rating")
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("falsePositives"),
        count("*").as("total"))
      .withColumn("fpRate", col("falsePositives") / col("total"))

  /** Collect built filters into the bounded driver artifact the reference
    * testers load (`bloomfilters_tester.py:81` unpickles the filter dict;
    * `tester/BloomFilterTester.java:83-88` stages it via DistributedCache).
    * One row per group — same contract as collecting the filters. */
  def collectFilters(filters: DataFrame): GroupFilters =
    GroupFilters(filters.select("rating", "m", "k", "bits").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))))

  /** Build + collect + broadcast in one step. */
  def broadcastFilters(train: DataFrame, p: Double): Broadcast[GroupFilters] =
    train.sparkSession.sparkContext.broadcast(collectFilters(buildFilters(train, p)))

  /** Stage 3, production unsharded formulation: probe through a broadcast
    * [[GroupFilters]] — a narrow codegen projection (group binary-search +
    * k hashes, zero per-row allocation), shipped once per executor. Missing
    * groups probe NULL and are skipped, matching [[fpStats]]'s inner join.
    */
  def fpStatsCollected(test: DataFrame, filters: Broadcast[GroupFilters]): DataFrame =
    test
      .select(col("rating"),
        bloom_probe_groups(filters, col("rating"), col("movieId")).as("hit"))
      .where(col("hit").isNotNull)
      .groupBy("rating")
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("falsePositives"),
        count("*").as("total"))
      .withColumn("fpRate", col("falsePositives") / col("total"))

  /** Flagship: full build -> probe round trip (SURVEY.md §7.5), probing
    * through the collected artifact like the reference testers. */
  def endToEnd(train: DataFrame, test: DataFrame, p: Double): DataFrame =
    fpStatsCollected(test, broadcastFilters(train, p))

  /** Reference-shaped build (SURVEY.md §7.2.5b): the explicit
    * hash-indexes column of the reference Spark engine —
    * `transform(sequence(0, k-1), i -> pmod(mmh3(key, i), m))`
    * (`bloomfilters_builder.py:44-54` via `bloomfilters_util.py:60-79`) —
    * exploded and bit-OR-aggregated. Byte-identical output to
    * [[buildFilters]] (the fused production path); exists for
    * explainability and as a cross-formulation invariant. */
  def buildFiltersIndexed(train: DataFrame, p: Double): DataFrame = {
    val geometry = sized(linecount(train), p)
    train
      .join(broadcast(geometry), "rating")
      .withColumn("idx", explode(transform(sequence(lit(0), col("k") - 1),
        i => pmod(graft.functions.mmh3(col("movieId"), i.cast("int")), col("m")))))
      .groupBy("rating", "n", "m", "k")
      .agg(graft.functions.bloom_build_indexed(col("idx"), col("m"), col("k")).as("bits"))
  }

  // -------------------------------------------------------------------
  // Sharded filters — the 100 TB shape.
  //
  // One row per group is a scale-killer twice over: a single group of
  // ~3.4e8 keys at p=0.05 hits the Int.MaxValue bit clamp (silently worse
  // FPP), and broadcasting rows of up to 268 MB of BINARY blows the
  // broadcast and driver memory. Sharding fixes both: each group's filter
  // becomes ceil(m_total / maxSlabBits) independent slabs keyed
  // (group, shard), each sized for its expected key share. A key routes to
  // exactly one slab — shard = pmod(mmh3(key, routeSeed), S) — at build
  // AND probe, so the zero-false-negative invariant is untouched, and the
  // per-probe FPP is the slab's own ~p. Row size is bounded by
  // maxSlabBits/8, the slab join key (group, shard) has no skew cliff, and
  // no clamp ever engages.
  // -------------------------------------------------------------------

  /** Routing seed. Disjoint from the bit seeds 0..k-1 so slab choice and
    * bit positions are independent hash draws. */
  val routeSeed = 1000003

  /** Sharded geometry from counts: shard count `s`, per-slab `m` (sized
    * for the slab's expected share of keys), constant `k`. */
  def shardedSized(counts: DataFrame, p: Double, maxSlabBits: Long): DataFrame = {
    require(maxSlabBits > 0, s"maxSlabBits must be positive, got $maxSlabBits")
    val bitsPerKey = -math.log(p) / (math.log(2) * math.log(2))
    counts
      .withColumn("s",
        greatest(lit(1L), ceil(ceil(col("n") * bitsPerKey) / maxSlabBits.toDouble))
          .cast("int"))
      .withColumn("m",
        least(lit(Int.MaxValue.toLong - 8),
          greatest(lit(1L), ceil(ceil(col("n") / col("s").cast("double")) * bitsPerKey)))
          .cast("int"))
      .withColumn("k", lit(BloomFilter.numHashes(p)))
  }

  /** Sharded build: one row per (rating, shard): `(rating, s, m, k, shard,
    * bits)`. Same single-shuffle shape as [[buildFilters]]; the shuffle
    * now carries S bounded slabs per group instead of one unbounded row. */
  def buildShardedFilters(train: DataFrame, p: Double,
      maxSlabBits: Long = 1L << 26): DataFrame = {
    // double pass over train (sizing, then build) — see buildFilters,
    // including its cache-lifetime contract (caller releases)
    train.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val geometry = shardedSized(linecount(train), p, maxSlabBits)
    train
      .join(broadcast(geometry), "rating")
      .withColumn("shard", pmod(graft.functions.mmh3(col("movieId"), routeSeed), col("s")))
      .groupBy("rating", "s", "m", "k", "shard")
      .agg(bloom_build_native(col("movieId"), col("m"), col("k")).as("bits"))
  }

  /** Sharded probe TOTALS via COGROUP — the fully distributed probe
    * without the join form's hidden memcpy: any join-shaped probe makes
    * codegen extract the joined BINARY per output row
    * (`UnsafeRow.getBinary` allocates and copies ~slabBytes for EVERY
    * probe — the r14 sf5 cohort measured 403s for the unsharded join and
    * 1072s for the slab join, vs 3.1s for the collected-broadcast probe).
    * Cogrouping probes with slabs on `(rating, shard)` extracts each
    * slab's bits ONCE per group and probes the group's iterator through
    * the same [[graft.core.BloomFilter]] kernel the codegen expression
    * uses — per-probe cost returns to k hashes, and the plan stays fully
    * distributed (no driver artifact): this is the probe shape for
    * filter sets too large to collect or broadcast, where
    * [[fpStatsCollected]] stops applying. It is also the REFERENCE'S OWN
    * reducer shape — `tester/ReducerTester.java:49-118` takes the
    * group's filter as the first value, then probes the remaining
    * iterator (SURVEY §2 A5) — recovered here because it is the
    * formulation whose per-probe cost stays k hashes at any filter
    * size. Exchanges carry
    * `(rating, shard, key)` probe rows and one slab row per
    * (group, shard) — both narrow, both skew-free by the shard design.
    * Missing groups are skipped (the §2.6 inner-join policy). */
  def probeTotalsSharded(test: DataFrame, filters: DataFrame): DataFrame =
    cogroupProbe(test, filters)

  /** The shared cogroup probe kernel behind [[probeTotalsSharded]] and
    * [[fpStatsShardedCogroup]]: per (rating, shard) group, extract the
    * slab's bits ONCE and stream the group's probes through it. Output
    * one `(rating, total, hits)` row per probed rating. */
  private def cogroupProbe(test: DataFrame, filters: DataFrame): DataFrame = {
    val spark = test.sparkSession
    import spark.implicits._
    val geometry = filters.select(col("rating"), col("s")).distinct()
    val routed = test
      .join(broadcast(geometry), "rating")
      .withColumn("shard",
        pmod(graft.functions.mmh3(col("movieId"), routeSeed), col("s")))
      .select(col("rating").cast("int"), col("shard").cast("int"),
        col("movieId"))
      .as[(Int, Int, String)]
    val slabs = filters
      .select(col("rating").cast("int"), col("shard").cast("int"),
        col("m").cast("int"), col("k").cast("int"), col("bits"))
      .as[(Int, Int, Int, Int, Array[Byte])]
    routed.groupByKey(r => (r._1, r._2))
      .cogroup(slabs.groupByKey(s => (s._1, s._2))) {
        case ((rating, shard), probes, slabIt) =>
          // size the guard from AT MOST TWO elements (ADVICE r15 #3): a
          // full toSeq would buffer every duplicate slab — each up to MBs
          // at production slab sizes — in executor memory just to count
          // them, so a badly malformed filter relation could OOM the task
          // before the loud require below ever fires
          val slab = slabIt.take(2).toSeq
          // a malformed filter relation (e.g. filters built twice and
          // unioned) must fail loudly, not probe one arbitrary slab and
          // silently undercount (ADVICE r14)
          require(slab.size <= 1,
            s"duplicate slab rows for (rating=$rating, shard=$shard) — " +
              "the filter relation must hold exactly one row per " +
              "(rating, shard)")
          // no filter -> skip the probes (§2.6); no probes -> the slab
          // contributes nothing (a group appears only when probed)
          if (slab.isEmpty || probes.isEmpty) Iterator.empty
          else {
            val (_, _, m, k, bits) = slab.head
            var total = 0L
            var hits = 0L
            probes.foreach { p =>
              total += 1
              if (graft.core.BloomFilter.mightContainBytes(bits, m, k,
                p._3.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
                hits += 1
            }
            Iterator((rating, total, hits))
          }
      }
      .toDF("rating", "total", "hits")
      .groupBy("rating")
      .agg(sum("total").as("total"), sum("hits").as("hits"))
  }

  /** The per-rating FP-rate face (reference P4+A5,
    * `tester/ReducerTester.java:102-113`) on the COGROUP probe — the
    * scale-safe shape [[probeTotalsSharded]] established, now covering
    * the `(falsePositives, total, fpRate)` output the reference reducer
    * emits (VERDICT r14 ask #2). Identical probe semantics to
    * [[fpStatsSharded]] (same routing, same slabs, same kernel — the
    * hit set is bit-identical); the cost model differs: per-probe cost
    * stays k hashes at ANY slab size, where the join form's per-row
    * binary extraction priced at 1071.8s for 8 MB slabs at sf5. */
  def fpStatsShardedCogroup(test: DataFrame, filters: DataFrame): DataFrame =
    cogroupProbe(test, filters)
      .select(col("rating"), col("hits").as("falsePositives"), col("total"))
      .withColumn("fpRate", col("falsePositives") / col("total"))

  /** Join-form sharded probe — FENCED (VERDICT r14 ask #2): every
    * join-shaped probe pays codegen's per-output-row `getBinary` memcpy
    * (~slabBytes per probe row; the sf5 campaign priced 8 MB slabs at
    * 1071.8s), so this formulation is safe ONLY where slabs are bounded
    * small (the 2 KB test-SF slabs). Production probes at any slab size
    * use [[fpStatsShardedCogroup]] / [[probeTotalsSharded]]; this stays
    * as the cross-formulation twin (same hit set by construction) and
    * the bounded-slab spec surface. */
  def fpStatsSharded(test: DataFrame, filters: DataFrame): DataFrame = {
    val geometry = filters.select("rating", "s", "m", "k").distinct()
    test
      .join(broadcast(geometry), "rating")
      .withColumn("shard", pmod(graft.functions.mmh3(col("movieId"), routeSeed), col("s")))
      .join(filters.select("rating", "shard", "bits"), Seq("rating", "shard"))
      .select(col("rating"),
        bloom_might_contain(col("bits"), col("m"), col("k"), col("movieId")).as("hit"))
      .groupBy("rating")
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("falsePositives"),
        count("*").as("total"))
      .withColumn("fpRate", col("falsePositives") / col("total"))
  }
}
