package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the Bloom kernel — the laws the
  * distributed build relies on (SURVEY.md §5.2.2). */
object BloomFilterPropSpec extends Properties("BloomFilter") {

  private val keyGen = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
  private val keysGen = Gen.nonEmptyListOf(keyGen).map(_.distinct)
  private val pGen = Gen.oneOf(0.01, 0.05, 0.1, 0.2)

  private def build(keys: Seq[String], p: Double): BloomFilter = {
    val bf = BloomFilter.create(keys.size.toLong.max(1), p)
    keys.foreach(bf.put)
    bf
  }

  property("no false negatives, ever") = forAll(keysGen, pGen) { (keys, p) =>
    val bf = build(keys, p)
    keys.forall(bf.mightContain)
  }

  property("insertion order is irrelevant") = forAll(keysGen, pGen) { (keys, p) =>
    build(keys, p).toBytes.sameElements(build(keys.reverse, p).toBytes)
  }

  property("duplicate insertion is idempotent") = forAll(keysGen, pGen) { (keys, p) =>
    // same geometry for both builds (create() sizes by key count, which
    // would differ between keys and keys++keys)
    val pp = if (p > 0 && p < 1) p else 0.05
    val m = BloomFilter.numBits(keys.size.toLong.max(1), pp)
    val k = BloomFilter.numHashes(pp)
    def of(ks: Seq[String]) = {
      val bf = BloomFilter.empty(m, k); ks.foreach(bf.put); bf
    }
    of(keys).toBytes.sameElements(of(keys ++ keys).toBytes)
  }

  property("merge == build of union (partial-aggregation lawfulness)") =
    forAll(keysGen, keysGen, pGen) { (a, b, p) =>
      val n = (a ++ b).distinct.size.toLong.max(1)
      val m = BloomFilter.numBits(n, p)
      val k = BloomFilter.numHashes(p)
      def of(keys: Seq[String]) = {
        val bf = BloomFilter.empty(m, k); keys.foreach(bf.put); bf
      }
      val merged = of(a).mergeInPlace(of(b))
      merged.toBytes.sameElements(of(a ++ b).toBytes)
    }

  property("merge is commutative") = forAll(keysGen, keysGen, pGen) { (a, b, p) =>
    val m = BloomFilter.numBits(16, p)
    val k = BloomFilter.numHashes(p)
    def of(keys: Seq[String]) = {
      val bf = BloomFilter.empty(m, k); keys.foreach(bf.put); bf
    }
    of(a).mergeInPlace(of(b)).toBytes.sameElements(of(b).mergeInPlace(of(a)).toBytes)
  }

  property("serialization round-trips") = forAll(keysGen, pGen) { (keys, p) =>
    val bf = build(keys, p)
    val back = BloomFilter.fromBytes(bf.m, bf.k, bf.toBytes)
    keys.forall(back.mightContain)
  }
}
