package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.BloomFilter

/** One input row of the per-group Bloom build: the key to insert plus the
  * group's filter geometry. Geometry rides on every row (joined in from
  * the sizing pass) because an [[Aggregator]] has no channel for per-group
  * parameters — SURVEY.md §7.4.1.
  */
case class BloomInput(key: String, m: Int, k: Int)

/** Mutable aggregation buffer. `m < 0` marks the zero buffer (geometry not
  * yet known); the bit array is allocated lazily from the first row. */
case class BloomBuf(var m: Int, var k: Int, var bits: Array[Byte])

/** Per-group Bloom-filter build as a typed aggregate:
  * `groupBy(rating).agg(bloom_build(key, m, k))` → packed filter bytes.
  *
  * This fuses the reference's P2 (hash-indexes projection,
  * `bloomfilters_util.py:60-79`), A2 (per-key index-list concat,
  * `bloomfilters_builder.py:44-54` — O(k·n) intermediate state) and A3
  * (bit-set fold, `bloomfilters_builder.py:24-41`,
  * `builder/BloomFilterReducer.java:46-94`) into one operator whose
  * partial-aggregation state is a single m-bit array per (partition,
  * group). At 100 TB that is the difference between shuffling O(k)
  * integers per input row and shuffling ≤ (#partitions × #groups)
  * fixed-size filters: map-side combine reduces the shuffle to the merge
  * of a few thousand byte arrays regardless of row count.
  *
  * Merge is bitwise OR — commutative/associative/idempotent (tested in
  * BloomFilterSpec), so partial aggregation is lawful.
  */
object BloomBuildAggregator extends Aggregator[BloomInput, BloomBuf, Array[Byte]] {

  override def zero: BloomBuf = BloomBuf(-1, -1, null)

  override def reduce(b: BloomBuf, in: BloomInput): BloomBuf = {
    if (b.m < 0) {
      b.m = in.m
      b.k = in.k
      b.bits = new Array[Byte](BloomFilter.numBytes(in.m))
    } else {
      // Geometry must be constant within a group; hashing keys with the
      // wrong (m, k) would corrupt the filter silently (false negatives).
      require(in.m == b.m && in.k == b.k,
        s"bloom_build: non-constant geometry within a group: " +
          s"buffer (m=${b.m},k=${b.k}) vs row (m=${in.m},k=${in.k})")
    }
    if (in.key != null) {
      BloomFilter.putBytesInto(b.bits, b.m, b.k, in.key.getBytes(StandardCharsets.UTF_8))
    }
    b
  }

  override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
    if (a.m < 0) b
    else if (b.m < 0) a
    else {
      BloomFilter.orInto(a.bits, b.bits)
      a
    }
  }

  override def finish(b: BloomBuf): Array[Byte] =
    if (b.m < 0) Array.emptyByteArray else b.bits

  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** One pre-hashed bit index plus the group geometry (reference-shaped
  * build input: the explicit index column of `bloomfilters_builder.py:44-54`
  * exploded to one row per index). */
case class BloomIndexInput(idx: Int, m: Int, k: Int)

/** Reference-shaped Bloom build (SURVEY.md §7.2.5b): consumes *explicit*
  * hash indexes — `explode(transform(sequence(0, k-1), i ->
  * pmod(mmh3(key, i), m)))` — and ORs each bit into the buffer. This is
  * the unfused P2→A2→A3 pipeline of the reference Spark engine
  * (`bloomfilters_builder.py:87-100`), kept for explainability and as a
  * cross-formulation invariant: its output must be byte-identical to
  * [[BloomBuildAggregator]]'s (asserted by the `a2_indexed_equiv` query
  * and PipelineSpec). The fused path is the production one — this shape
  * shuffles O(k) ints per input row pre-combine instead of fixed-size
  * buffers.
  */
object BloomIndexAggregator extends Aggregator[BloomIndexInput, BloomBuf, Array[Byte]] {

  override def zero: BloomBuf = BloomBuf(-1, -1, null)

  override def reduce(b: BloomBuf, in: BloomIndexInput): BloomBuf = {
    if (b.m < 0) {
      b.m = in.m
      b.k = in.k
      b.bits = new Array[Byte](BloomFilter.numBytes(in.m))
    } else {
      require(in.m == b.m && in.k == b.k,
        s"bloom_build_indexed: non-constant geometry within a group: " +
          s"buffer (m=${b.m},k=${b.k}) vs row (m=${in.m},k=${in.k})")
    }
    require(in.idx >= 0 && in.idx < b.m,
      s"bloom_build_indexed: index ${in.idx} out of range [0, ${b.m})")
    b.bits(in.idx >>> 3) = (b.bits(in.idx >>> 3) | (1 << (in.idx & 7))).toByte
    b
  }

  override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
    if (a.m < 0) b
    else if (b.m < 0) a
    else {
      BloomFilter.orInto(a.bits, b.bits)
      a
    }
  }

  override def finish(b: BloomBuf): Array[Byte] =
    if (b.m < 0) Array.emptyByteArray else b.bits

  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
