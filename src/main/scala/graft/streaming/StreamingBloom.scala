package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.BloomFilter

/** Streaming extensions of the bloom/dedup pipeline (beyond the batch-only
  * reference — SURVEY.md §2.7 lists streaming as absent there, §7.6 names
  * incremental filter build as the natural extension).
  *
  * Design notes for scale:
  *  - State is keyed by group (and optionally shard), so it partitions
  *    across the cluster like any keyed state; each group's state is one
  *    fixed-size bloom buffer — bounded memory per key by construction,
  *    unlike `dropDuplicates` whose state grows with distinct keys.
  *  - Geometry must be chosen up front (a stream has no sizing pass):
  *    callers size for expected capacity; the FPP guarantee degrades
  *    gracefully past it (documented, not silent — [[FilterState]] carries
  *    the insert count).
  */
object StreamingBloom {

  /** Keyed input record: group + key (the streaming twin of the batch
    * pipeline's (rating, movieId)). */
  final case class KeyedRecord(group: Int, key: String)

  /** Per-group filter state: geometry + packed bits + inserts-so-far. */
  final case class FilterState(group: Int, m: Int, k: Int, n: Long, bits: Array[Byte])

  /** Incrementally build one Bloom filter per group over a stream:
    * each micro-batch folds its keys into per-group state and emits the
    * updated `(group, m, k, n, bits)` row (update mode). Capacity sizes
    * the filter once — `m = numBits(capacityPerGroup, p)`.
    */
  def incrementalFilters(
      records: Dataset[KeyedRecord],
      capacityPerGroup: Long,
      p: Double): Dataset[FilterState] = {
    import records.sparkSession.implicits._
    val m = BloomFilter.numBits(capacityPerGroup, p)
    val k = BloomFilter.numHashes(p)
    records
      .groupByKey(_.group)
      .mapGroupsWithState[FilterState, FilterState](GroupStateTimeout.NoTimeout) {
        (group, rows, state: GroupState[FilterState]) =>
          val s = state.getOption.getOrElse(
            FilterState(group, m, k, 0L, new Array[Byte](BloomFilter.numBytes(m))))
          var n = s.n
          rows.foreach { r =>
            if (r.key != null) {
              BloomFilter.putBytesInto(s.bits, s.m, s.k,
                r.key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              n += 1
            }
          }
          val updated = s.copy(n = n)
          state.update(updated)
          updated
      }
  }

  /** Streaming first-seen dedup with *bounded* state: emits only records
    * whose key's bloom probe missed, then inserts the key. State per group
    * is one fixed-size filter — the 100 TB stream shape, trading exactness
    * (≈ p of genuinely-new keys are wrongly dropped once the filter fills)
    * for O(1) memory. The exact (unbounded-state) alternative is
    * [[firstSeenExact]].
    */
  def firstSeenBloom(
      records: Dataset[KeyedRecord],
      capacityPerGroup: Long,
      p: Double): Dataset[KeyedRecord] = {
    import records.sparkSession.implicits._
    val m = BloomFilter.numBits(capacityPerGroup, p)
    val k = BloomFilter.numHashes(p)
    records
      .groupByKey(_.group)
      .flatMapGroupsWithState[FilterState, KeyedRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group, rows, state: GroupState[FilterState]) =>
          val s = state.getOption.getOrElse(
            FilterState(group, m, k, 0L, new Array[Byte](BloomFilter.numBytes(m))))
          var n = s.n
          val fresh = rows.filter { r =>
            val bytes = r.key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val seen = BloomFilter.mightContainBytes(s.bits, s.m, s.k, bytes)
            if (!seen) {
              BloomFilter.putBytesInto(s.bits, s.m, s.k, bytes)
              n += 1
            }
            !seen
          }.toVector // drain before updating state
          state.update(s.copy(n = n))
          fresh.iterator
      }
  }

  /** Streaming exact first-seen dedup: watermark + `dropDuplicates` — the
    * built-in exact path whose state retention is bounded by the watermark
    * horizon instead of a filter size. */
  def firstSeenExact(records: DataFrame, tsCol: String, watermark: String): DataFrame =
    records
      .withWatermark(tsCol, watermark)
      .dropDuplicates("group", "key")

  /** Stream-static probe — the streaming twin of the batch tester: a
    * stream of keyed records joins the (static, e.g. [[graft.operators
    * .FilterStore]]-reloaded) filter relation on `group` and tests
    * membership inside codegen. The static side broadcasts; the stream
    * never shuffles. Returns the input rows + `hit` flag (downstream can
    * window-aggregate FP counts).
    *
    * This is the stream-static JOIN surface; when the filter set is
    * bounded enough to collect, prefer the broadcast
    * [[graft.core.GroupFilters]] projection (`bloom_probe_groups`, as the
    * st3 query does) — the join materializes `bits` once per probed row. */
  def streamingProbe(stream: DataFrame, filters: DataFrame): DataFrame =
    stream
      .join(org.apache.spark.sql.functions.broadcast(
        filters.select(col("group"), col("m"), col("k"), col("bits"))), Seq("group"))
      .withColumn("hit",
        graft.functions.bloom_might_contain(col("bits"), col("m"), col("k"), col("key")))
      .drop("m", "k", "bits")

  /** Watermarked event-time windowed linecount — the streaming twin of the
    * batch sizing pass (A1): counts per (window, group) with late data
    * bounded by the watermark. */
  def windowedLinecount(
      records: DataFrame, tsCol: String, watermark: String, window_ : String): DataFrame =
    records
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("group"))
      .agg(count("*").as("n"))
}
