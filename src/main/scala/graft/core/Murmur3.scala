package graft.core

import java.nio.charset.StandardCharsets

/** Standard MurmurHash3 x86_32 with an explicit seed.
  *
  * This is the deterministic hash family of the engine: the same algorithm
  * Python's `mmh3.hash(key, seed)` implements (used by the reference Spark
  * tester, see reference `spark-bloom-filter/bloomfilters_util.py:79`) and
  * Guava's `murmur3_32_fixed`. The reference's Hadoop engine uses
  * MurmurHash **2** with `Math.abs(h % m)` folding
  * (reference `builder/BloomFilterMapper.java:96-104`), so the two reference
  * engines were never bit-compatible with each other; we standardize on
  * murmur3 + floorMod (Python `%` semantics) as the engine-wide contract.
  *
  * Spark's built-in `hash()` is the same algorithm but with the seed fixed
  * at 42 and a non-standard tail mix for unaligned byte suffixes
  * (`Murmur3_x86_32.hashUnsafeBytes`), hence this self-contained impl.
  */
object Murmur3 {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashString(s: String, seed: Int): Int =
    hashBytes(s.getBytes(StandardCharsets.UTF_8), seed)

  def hashBytes(data: Array[Byte], seed: Int): Int =
    hashBytes(data, 0, data.length, seed)

  def hashBytes(data: Array[Byte], offset: Int, len: Int, seed: Int): Int = {
    var h1 = seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = offset + (i << 2)
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = offset + (nblocks << 2)
    var k1 = 0
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    fmix(h1 ^ len)
  }

  private def fmix(h: Int): Int = {
    var h1 = h
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Bit index for hash function `seed` into a filter of `m` bits.
    * `floorMod` = Python `%` semantics (always non-negative). */
  def index(keyBytes: Array[Byte], seed: Int, m: Int): Int =
    java.lang.Math.floorMod(hashBytes(keyBytes, seed), m)
}
