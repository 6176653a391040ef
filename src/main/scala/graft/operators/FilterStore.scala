package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filter-artifact persistence — the reference's build → persist → reload
  * lifecycle (K2/K3 sinks: `builder/BloomFilterBuilder.java:74-75`
  * SequenceFile, `bloomfilters_builder.py:100` `saveAsPickleFile`; S3/S4
  * scans: `tester/BloomFilterTester.java:83-88`,
  * `bloomfilters_tester.py:81`), re-expressed as Parquet.
  *
  * Parquet beats both reference formats at scale: columnar pruning means a
  * geometry-only reader never fetches the BINARY slabs, the artifact is
  * splittable across executors, and the packed byte layout of
  * [[graft.core.BloomFilter]] serializes as-is (the identity — tested
  * byte-stable in FilterStoreSpec).
  */
object FilterStore {

  /** Persist filters `(group…, m, k, bits)`. Slab rows are bounded (see
    * [[BloomPipeline.buildShardedFilters]]), so one output file per
    * shuffle partition is fine; `sortWithinPartitions` keeps the artifact
    * layout deterministic for golden tests. */
  def save(filters: DataFrame, path: String): Unit =
    filters.sortWithinPartitions(filters.columns.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Reload a filter artifact for probing in a fresh query/session. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
