package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffling fact tables once at write time
  * so repeated equi-joins/aggregations on the bucket key run with NO
  * exchange at read time — the classic amortization for 100 TB fact
  * tables that join on the same key in every pipeline run.
  *
  * Bucket metadata lives in the session catalog; both sides bucketed by
  * the same column count ⇒ Catalyst plans a sort-merge join with zero
  * shuffle (asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (idempotent per
    * session: recreates only if absent). Returns the table name. */
  def ensureBucketed(
      spark: SparkSession,
      df: => DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int = 8): String = {
    if (!spark.catalog.tableExists(table)) {
      // the in-memory catalog forgets tables across sessions but their
      // warehouse files survive; clear a stale location before recreating
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val stale = java.nio.file.Paths.get(warehouse, table)
      if (java.nio.file.Files.exists(stale)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(stale).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.delete)
      }
      df.write
        .bucketBy(numBuckets, bucketCol)
        .sortBy(bucketCol)
        .mode("overwrite")
        .saveAsTable(table)
    }
    table
  }
}
