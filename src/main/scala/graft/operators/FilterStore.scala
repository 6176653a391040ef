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

  // --- Hadoop SequenceFile lane: the reference's LITERAL K2/S3 format
  // (`builder/BloomFilterBuilder.java:74-75` writes
  // SequenceFileOutputFormat; `tester/BloomFilterTester.java:83-88`
  // reads it back). The Parquet artifact above is the production format
  // (columnar pruning, splittable slabs); this lane exists so a user of
  // the reference can hand its artifacts across — record layout
  // `(IntWritable rating, BytesWritable m:int|k:int|bits)`, one record
  // per group filter. The RDD API is the right tool here: SequenceFile
  // is a record-IO format with no DataFrame source, and the per-record
  // work is a fixed-size header pack/unpack.

  /** Persist unsharded filters `(rating, m, k, bits)` as a Hadoop
    * SequenceFile. Overwrites `path`. */
  def saveSequenceFile(filters: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io.{BytesWritable, IntWritable}
    val spark = filters.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
    filters.select("rating", "m", "k", "bits").rdd
      .map { r =>
        val bits = r.getAs[Array[Byte]](3)
        val buf = java.nio.ByteBuffer.allocate(8 + bits.length)
        buf.putInt(r.getInt(1)).putInt(r.getInt(2)).put(bits)
        (new IntWritable(r.getInt(0)), new BytesWritable(buf.array()))
      }
      .saveAsSequenceFile(path)
  }

  /** Reload a [[saveSequenceFile]] artifact as the standard
    * `(rating, m, k, bits)` relation. Writables are copied out
    * immediately — Hadoop's record reader reuses the instances. */
  def loadSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.{BytesWritable, IntWritable}
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[IntWritable], classOf[BytesWritable])
      .map { case (kw, vw) =>
        // BytesWritable's backing array over-allocates: honor getLength
        val bytes = java.util.Arrays.copyOf(vw.getBytes, vw.getLength)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        val m = buf.getInt
        val k = buf.getInt
        val bits = new Array[Byte](bytes.length - 8)
        buf.get(bits)
        (kw.get, m, k, bits)
      }
      .toDF("rating", "m", "k", "bits")
  }
}
