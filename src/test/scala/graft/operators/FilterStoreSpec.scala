package graft.operators

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.BloomFilter
import graft.functions.bloom_might_contain

/** Filter persist → reload round-trip (reference S3/S4 + K2/K3) and
  * artifact byte-stability. */
class FilterStoreSpec extends SparkSuite {
  import spark.implicits._

  private val p = 0.05

  test("save/load round-trip: reloaded filters probe identically") {
    val train = (0 until 2000).map(i => (s"key-$i", i % 4)).toDF("movieId", "rating")
    val filters = BloomPipeline.buildFilters(train, p)
    val path = Files.createTempDirectory("graft_filters").toString

    FilterStore.save(filters, path)
    val reloaded = FilterStore.load(spark, path)

    // schema and content identical
    assert(reloaded.columns.sorted === filters.columns.sorted)
    val a = filters.select("rating", "m", "k", "bits").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toSet
    val b = reloaded.select("rating", "m", "k", "bits").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(a === b)

    // zero FN through the reloaded artifact
    val fn = train.join(broadcast(reloaded.select("rating", "m", "k", "bits")), "rating")
      .where(!bloom_might_contain($"bits", $"m", $"k", $"movieId"))
      .count()
    assert(fn === 0L)
  }

  test("SequenceFile lane: byte-identical filters to the Parquet artifact") {
    // the reference's literal K2/S3 format must carry the SAME filters
    // bit for bit — one artifact family, two containers
    val train = (0 until 2000).map(i => (s"key-$i", i % 4)).toDF("movieId", "rating")
    val filters = BloomPipeline.buildFilters(train, p)
    val dir = Files.createTempDirectory("graft_seq").toString
    FilterStore.saveSequenceFile(filters, s"$dir/seq")
    val reloaded = FilterStore.loadSequenceFile(spark, s"$dir/seq")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("rating", "m", "k", "bits").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(canon(reloaded) === canon(filters))
    // and it IS a Hadoop SequenceFile: the container magic is "SEQ"
    val part = new java.io.File(s"$dir/seq").listFiles()
      .filter(f => f.getName.startsWith("part-")).head
    val magic = java.nio.file.Files.readAllBytes(part.toPath).take(3)
    assert(magic.map(_.toChar).mkString === "SEQ")
  }

  test("filter bytes are a stable golden artifact (deterministic build)") {
    // tiny fixed corpus -> the packed filter bytes must never change
    // across engine versions (hash family, seeds, layout are the contract)
    val train = (1 to 20).map(i => (s"tt$i", 1)).toDF("movieId", "rating")
    val bits = BloomPipeline.buildFilters(train, 0.1).head().getAs[Array[Byte]]("bits")
    val sha = MessageDigest.getInstance("SHA-256").digest(bits)
      .map("%02x".format(_)).mkString

    // independently derived from the core kernel — the golden value
    val m = BloomFilter.numBits(20, 0.1)
    val bf = BloomFilter.empty(m, BloomFilter.numHashes(0.1))
    (1 to 20).foreach(i => bf.put(s"tt$i"))
    val expected = MessageDigest.getInstance("SHA-256").digest(bf.toBytes)
      .map("%02x".format(_)).mkString

    assert(sha === expected)
    // pinned literal: fails loudly if hash family / layout ever drifts
    assert(sha === "32734819004abd9609b3babd40ffea73399b563b8a5db31d377db072b210704b")
  }

  test("sharded artifact round-trips and probes with zero FN") {
    val train = (0 until 3000).map(i => (s"key-$i", i % 2)).toDF("movieId", "rating")
    val filters = BloomPipeline.buildShardedFilters(train, p, maxSlabBits = 2048)
    val path = Files.createTempDirectory("graft_filters_sharded").toString
    FilterStore.save(filters, path)
    val stats = BloomPipeline.fpStatsSharded(train, FilterStore.load(spark, path))
    // probing train itself: every hit is a true member, zero misses
    val rows = stats.collect()
    assert(rows.map(_.getAs[Long]("falsePositives")).sum ===
      rows.map(_.getAs[Long]("total")).sum)
  }

  test("geometry-only reads prune the BINARY slab column at the scan") {
    // the scaladoc claim that columnar pruning keeps a geometry reader
    // from ever fetching the slabs — pinned on the actual read schema
    val train = (0 until 500).map(i => (s"key-$i", i % 2)).toDF("movieId", "rating")
    val path = Files.createTempDirectory("graft_filters_geom").toString
    FilterStore.save(BloomPipeline.buildFilters(train, p), path)
    val geom = FilterStore.load(spark, path).select("rating", "m", "k")
    val read = geom.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("rating") && read.contains("m"), read)
    assert(!read.contains("bits"), s"slab column must not reach the scan: $read")
  }

  test("sharded slab rows are byte-stable across independent builds") {
    // two independently built + persisted sharded artifacts of the same
    // corpus must agree slab for slab, byte for byte — the (group, shard)
    // routing and per-slab bit layout are part of the artifact contract
    val train = (0 until 3000).map(i => (s"key-$i", i % 2)).toDF("movieId", "rating")
    def buildDump(): Map[(Int, Int), (Int, Int, Int, String)] = {
      val path = Files.createTempDirectory("graft_slab_stable").toString
      FilterStore.save(
        BloomPipeline.buildShardedFilters(train, p, maxSlabBits = 2048), path)
      FilterStore.load(spark, path)
        .select("rating", "shard", "s", "m", "k", "bits").collect()
        .map { r =>
          val sha = MessageDigest.getInstance("SHA-256")
            .digest(r.getAs[Array[Byte]]("bits")).map("%02x".format(_)).mkString
          (r.getInt(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3), r.getInt(4), sha)
        }.toMap
    }
    val first = buildDump()
    val second = buildDump()
    assert(first.size > 2, "slab forcing must yield multiple shards")
    assert(first === second)
  }
}
