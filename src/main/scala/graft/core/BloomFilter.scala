package graft.core

import java.nio.charset.StandardCharsets

/** A Bloom filter backed by a packed byte array (bit `i` lives in byte
  * `i >> 3`, mask `1 << (i & 7)` — identical layout in memory and on the
  * wire, so serialization is the identity).
  *
  * Semantics match the reference pipeline (reference
  * `spark-bloom-filter/bloomfilters_util.py:60-79`,
  * `hadoop-bloom-filter/.../builder/BloomFilterReducer.java:46-94`): k
  * seeded hash functions (seeds 0..k-1), one bit each, membership = all k
  * bits set. The reference stores one *boolean per bit*
  * (`BooleanWritable[]` / Python `list[bool]`); we pack 8 bits/byte, an
  * 8-64x space win that matters when filters are broadcast cluster-wide.
  */
final class BloomFilter(val m: Int, val k: Int, val bits: Array[Byte]) {
  require(m > 0, s"m must be positive, got $m")
  require(k > 0, s"k must be positive, got $k")
  require(bits.length == BloomFilter.numBytes(m),
    s"bits array has ${bits.length} bytes, expected ${BloomFilter.numBytes(m)} for m=$m")

  def put(key: String): Unit = putBytes(key.getBytes(StandardCharsets.UTF_8))

  def putBytes(keyBytes: Array[Byte]): Unit = {
    var i = 0
    while (i < k) {
      val idx = Murmur3.index(keyBytes, i, m)
      bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def mightContain(key: String): Boolean =
    BloomFilter.mightContainBytes(bits, m, k, key.getBytes(StandardCharsets.UTF_8))

  /** Bitwise OR; merge is commutative, associative and idempotent, which is
    * what makes the distributed build a lawful partial aggregation. */
  def mergeInPlace(other: BloomFilter): BloomFilter = {
    require(other.m == m && other.k == k,
      s"cannot merge BloomFilter(m=${other.m},k=${other.k}) into (m=$m,k=$k)")
    var i = 0
    while (i < bits.length) {
      bits(i) = (bits(i) | other.bits(i)).toByte
      i += 1
    }
    this
  }

  def setBitCount: Int = {
    var c = 0
    var i = 0
    while (i < bits.length) { c += Integer.bitCount(bits(i) & 0xff); i += 1 }
    c
  }

  def toBytes: Array[Byte] = bits
}

object BloomFilter {

  /** k = ceil(-ln p / ln 2) — parity with reference
    * `BloomFilterUtils.java:111-117` / `bloomfilters_util.py:15`. */
  def numHashes(p: Double): Int = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    math.ceil(-math.log(p) / math.log(2)).toInt
  }

  /** m = ceil(-n ln p / ln^2 2) — parity with reference
    * `BloomFilterUtils.java:127-133` / `bloomfilters_util.py:27`. */
  def numBits(n: Long, p: Double): Int = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val m = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2)))
    math.max(1L, math.min(m.toLong, Int.MaxValue.toLong - 8)).toInt
  }

  def numBytes(m: Int): Int = (m + 7) >>> 3

  def create(n: Long, p: Double): BloomFilter = {
    val m = numBits(n, p)
    new BloomFilter(m, numHashes(p), new Array[Byte](numBytes(m)))
  }

  def empty(m: Int, k: Int): BloomFilter =
    new BloomFilter(m, k, new Array[Byte](numBytes(m)))

  def fromBytes(m: Int, k: Int, bytes: Array[Byte]): BloomFilter =
    new BloomFilter(m, k, bytes)

  // ---- static kernels (also the codegen targets of the Catalyst
  // expressions in graft.functions — keep signatures stable) ----

  /** All k bits set ⇒ candidate member. Static so generated code can call
    * it without a closure object. */
  def mightContainBytes(bits: Array[Byte], m: Int, k: Int, keyBytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < k) {
      val idx = Murmur3.index(keyBytes, i, m)
      if ((bits(idx >>> 3) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Set all k bits for a key into a caller-owned buffer (aggregator path). */
  def putBytesInto(bits: Array[Byte], m: Int, k: Int, keyBytes: Array[Byte]): Unit = {
    var i = 0
    while (i < k) {
      val idx = Murmur3.index(keyBytes, i, m)
      bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  /** Bitwise-OR `src` into `dst` (sizes must match). */
  def orInto(dst: Array[Byte], src: Array[Byte]): Unit = {
    var i = 0
    while (i < dst.length) { dst(i) = (dst(i) | src(i)).toByte; i += 1 }
  }
}
