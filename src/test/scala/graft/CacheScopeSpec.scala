package graft

import org.apache.spark.storage.StorageLevel

/** Cache-ownership lifecycle ([[CacheScope]], VERDICT r13 ask #6): loan
  * releases on exit (success and failure), owns/release frees exactly the
  * registered dependencies, transfer follows a post-processed result. */
class CacheScopeSpec extends SparkSuite {
  import spark.implicits._

  test("loan persists for the body and unpersists after, even on throw") {
    val df = (1 to 10).toDF("x")
    var seenLevel: StorageLevel = StorageLevel.NONE
    CacheScope.loan(df) { c =>
      c.count()
      seenLevel = c.storageLevel
    }
    assert(seenLevel !== StorageLevel.NONE)
    assert(df.storageLevel === StorageLevel.NONE)
    val df2 = (1 to 10).toDF("y")
    intercept[RuntimeException] {
      CacheScope.loan(df2) { c => c.count(); throw new RuntimeException("x") }
    }
    assert(df2.storageLevel === StorageLevel.NONE)
  }

  test("owns/release frees the registered dependency") {
    val dep = (1 to 100).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    dep.count()
    val result = CacheScope.owns(dep.select(col("x") * 2), dep)
    assert(result.count() === 100)
    assert(dep.storageLevel !== StorageLevel.NONE)
    CacheScope.release(result)
    assert(dep.storageLevel === StorageLevel.NONE)
    CacheScope.release(result) // idempotent
  }

  test("release on an unregistered result is a no-op") {
    CacheScope.release((1 to 3).toDF("x"))
  }

  test("transfer moves ownership to the derived result") {
    val dep = (1 to 50).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    dep.count()
    val mid = CacheScope.owns(dep.select(col("x") + 1), dep)
    val fin = CacheScope.transfer(mid, mid.select(col("(x + 1)").as("y")))
    CacheScope.release(mid) // ownership moved: releasing mid frees nothing
    assert(dep.storageLevel !== StorageLevel.NONE)
    CacheScope.release(fin)
    assert(dep.storageLevel === StorageLevel.NONE)
  }

  test("persist-and-return operators register their cache ownership") {
    val df = (1 to 40).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val (ranked, total) = graft.operators.Ranks.withGlobalRank(
      df, Seq(col("k"), col("id")), "r")
    assert(total === 40)
    assert(ranked.count() === 40)
    val before = spark.sparkContext.getPersistentRDDs.size
    CacheScope.release(ranked)
    assert(spark.sparkContext.getPersistentRDDs.size < before ||
      before === 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
