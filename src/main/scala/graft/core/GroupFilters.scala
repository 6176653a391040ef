package graft.core

/** An immutable, driver-collected set of per-group Bloom filters — the
  * probe-side artifact of the reference testers, which both load the built
  * filters driver-side and ship them to every worker (reference
  * `spark-bloom-filter/bloomfilters_tester.py:81` unpickles + broadcasts
  * the filter dict; `hadoop-bloom-filter/.../tester/BloomFilterTester.java:83-88`
  * stages the SequenceFile through the DistributedCache).
  *
  * Bounded by construction: one entry per group (the reference's 10 rating
  * classes), so collecting it is the same contract as collecting the
  * filters themselves. Probing through this object instead of a
  * filters-side join avoids materializing the m-bit `bits` column once per
  * probed row (BINARY attribute access copies the array: ~19 KB x 10^5..10^9
  * rows of pure memcpy at bench/cluster scale) — the probe becomes a
  * narrow, allocation-free projection inside whole-stage codegen.
  *
  * Groups are kept in a sorted array; lookup is a branch-free-ish binary
  * search (log2(#groups) compares, no boxing, no hashing).
  */
final class GroupFilters private (
    val groups: Array[Int],
    val ms: Array[Int],
    val ks: Array[Int],
    val slabs: Array[Array[Byte]]) extends Serializable {

  def size: Int = groups.length

  def totalBytes: Long = {
    var s = 0L
    var i = 0
    while (i < slabs.length) { s += slabs(i).length; i += 1 }
    s
  }

  /** Index of `group`, or a negative value if absent (binary search). */
  def indexOf(group: Int): Int = java.util.Arrays.binarySearch(groups, group)

  /** Probe slot `i` (a valid [[indexOf]] result) with a raw key. */
  def mightContain(i: Int, keyBytes: Array[Byte]): Boolean =
    BloomFilter.mightContainBytes(slabs(i), ms(i), ks(i), keyBytes)

  override def toString: String =
    s"GroupFilters(${groups.length} groups, ${totalBytes} filter bytes)"
}

object GroupFilters {

  /** Build from `(group, m, k, bits)` rows. Groups must be distinct. */
  def apply(rows: Seq[(Int, Int, Int, Array[Byte])]): GroupFilters = {
    val sorted = rows.sortBy(_._1)
    var i = 1
    while (i < sorted.length) {
      require(sorted(i)._1 != sorted(i - 1)._1,
        s"duplicate group ${sorted(i)._1} in GroupFilters input")
      i += 1
    }
    new GroupFilters(
      sorted.map(_._1).toArray,
      sorted.map(_._2).toArray,
      sorted.map(_._3).toArray,
      sorted.map(_._4).toArray)
  }
}
