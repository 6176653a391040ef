package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Explicit cache ownership for operators that persist intermediate
  * relations (VERDICT r13 ask #6).
  *
  * Two lifecycles exist in this library:
  *
  *  1. '''In-function''' — every consumer of the persisted relation runs
  *     before the operator returns (the collected-codebook / offsets-job
  *     pattern). Use [[loan]]: persist, run, unpersist, no leak possible.
  *
  *  2. '''Persist-and-return''' — the persisted relation must outlive the
  *     operator because the RETURNED DataFrame reads it lazily
  *     (`Ranks.withGlobalRank`'s sorted base, `Multimodal.videoNearDup`'s
  *     hash relation, `Dedup.corpusPrep`'s scored corpus). The operator
  *     registers the dependency with [[owns]]; the caller releases it
  *     with [[release]] after its first full action over the result.
  *     Harness callers (Bench/Verify) need not bother: their per-query
  *     `spark.catalog.clearCache()` sweep is the documented backstop.
  *     A long-lived service embedding these operators calls [[release]].
  *
  * The registry holds WEAK keys: once a caller drops the returned
  * DataFrame, the bookkeeping entry is collectable (the cached blocks
  * themselves live until `release`/`clearCache` — Spark's CacheManager
  * pins them — which is exactly the documented contract above).
  */
object CacheScope {

  private val owned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]())

  /** Results that ARE their own cached relation (`owns(res, res)` —
    * the Graph iterative lanes return the persisted final round
    * directly). Kept out of `owned`: a value strongly referencing its
    * own weak key would make the entry immortal, pinning one plan per
    * call for the life of the session. */
  private val selfOwned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df`, run `body` on it (every consumer of the cache must
    * complete inside `body`), then unpersist non-blocking. */
  def loan[A](df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(
      body: DataFrame => A): A = {
    val cached = df.persist(level)
    try body(cached)
    finally { cached.unpersist(blocking = false); () }
  }

  /** Record that `result` owns the persisted relations `deps` (they must
    * stay cached until `result`'s first full action); returns `result`
    * so call sites can register in tail position. */
  def owns(result: DataFrame, deps: DataFrame*): DataFrame = {
    val (self, others) = deps.partition(_ eq result)
    if (self.nonEmpty) selfOwned.put(result, java.lang.Boolean.TRUE)
    if (others.nonEmpty) {
      val prior = owned.get(result)
      owned.put(result, if (prior == null) others else prior ++ others)
    }
    result
  }

  /** Move ownership from an intermediate result to a derived one (for
    * operators that post-process an owning result before returning):
    * returns `to`, now owning everything `from` owned. */
  def transfer(from: DataFrame, to: DataFrame): DataFrame = {
    val deps = owned.remove(from)
    if (deps != null) {
      val prior = owned.get(to)
      owned.put(to, if (prior == null) deps else prior ++ deps)
    }
    // a self-owning `from` becomes an ordinary dependency of `to` (the
    // derived result must keep from's cache alive until its own action);
    // an identity transfer (from eq to) must KEEP the self-registration,
    // not drop it (r15 review)
    if (selfOwned.remove(from) != null) {
      if (from eq to) selfOwned.put(to, java.lang.Boolean.TRUE)
      else owns(to, from): Unit
    }
    to
  }

  /** Release every persisted relation `result` owns (non-blocking).
    * Callers invoke this after their first full action over `result`;
    * idempotent, and a no-op for results that own nothing. */
  def release(result: DataFrame): Unit = {
    val deps = owned.remove(result)
    if (deps != null) deps.foreach(_.unpersist(blocking = false))
    if (selfOwned.remove(result) != null) {
      result.unpersist(blocking = false); ()
    }
  }
}
