package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class BloomFilterSpec extends AnyFunSuite {

  test("sizing formulas match reference BloomFilterUtils outputs") {
    // k = ceil(-ln p / ln 2): p=0.2 -> 3 (the scripts' default), 0.01 -> 7,
    // 0.05 -> 5, 0.1 -> 4 (SURVEY.md §5.2 parity table).
    assert(BloomFilter.numHashes(0.2) === 3)
    assert(BloomFilter.numHashes(0.01) === 7)
    assert(BloomFilter.numHashes(0.05) === 5)
    assert(BloomFilter.numHashes(0.1) === 4)
    assert(BloomFilter.numBits(1000, 0.01) === math.ceil(
      -1000 * math.log(0.01) / (math.log(2) * math.log(2))).toInt)
    assert(BloomFilter.numBits(1, 0.5) >= 1)
  }

  test("no false negatives — the hard invariant") {
    val rnd = new Random(1)
    for (trial <- 0 until 50) {
      val keys = (0 until (1 + rnd.nextInt(500)))
        .map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(16)).mkString)
      val bf = BloomFilter.create(keys.size.toLong, 0.05)
      keys.foreach(bf.put)
      keys.foreach(k => assert(bf.mightContain(k), s"false negative for '$k' (trial $trial)"))
    }
  }

  test("observed FPP on disjoint probes is within 2x of requested p") {
    val p = 0.05
    val n = 5000
    val bf = BloomFilter.create(n.toLong, p)
    (0 until n).foreach(i => bf.put(s"train-$i"))
    val probes = 20000
    val fp = (0 until probes).count(i => bf.mightContain(s"test-$i"))
    val observed = fp.toDouble / probes
    assert(observed < 2 * p, s"observed FPP $observed vs requested $p")
    assert(observed > p / 4, s"observed FPP $observed suspiciously low vs $p")
  }

  test("merge is commutative, associative, idempotent (aggregator lawfulness)") {
    val rnd = new Random(2)
    val m = 1024; val k = 4
    def randKeys(): List[String] =
      List.fill(rnd.nextInt(50))(rnd.alphanumeric.take(8).mkString)
    def build(keys: List[String]*): Array[Byte] = {
      val bf = BloomFilter.empty(m, k)
      keys.flatten.foreach(bf.put)
      bf.toBytes
    }
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      val dst = x.clone(); BloomFilter.orInto(dst, y); dst
    }
    for (_ <- 0 until 30) {
      val (a, b, c) = (randKeys(), randKeys(), randKeys())
      assert(merge(build(a), build(b)).sameElements(merge(build(b), build(a))))
      assert(merge(merge(build(a), build(b)), build(c))
        .sameElements(merge(build(a), merge(build(b), build(c)))))
      assert(merge(build(a), build(a)).sameElements(build(a)))
      assert(merge(build(a), build(b)).sameElements(build(a, b)))
    }
  }

  test("serialization is identity / roundtrips") {
    val bf = BloomFilter.create(100, 0.1)
    (0 until 100).foreach(i => bf.put(s"key-$i"))
    val restored = BloomFilter.fromBytes(bf.m, bf.k, bf.toBytes)
    (0 until 100).foreach(i => assert(restored.mightContain(s"key-$i")))
    assert(restored.setBitCount === bf.setBitCount)
  }

  test("static kernels agree with instance methods") {
    val rnd = new Random(3)
    for (_ <- 0 until 100) {
      val keys = List.fill(1 + rnd.nextInt(100))(rnd.alphanumeric.take(10).mkString)
      val probe = rnd.alphanumeric.take(10).mkString
      val bf = BloomFilter.create(keys.size.toLong, 0.1)
      keys.foreach(bf.put)
      val viaStatic = BloomFilter.mightContainBytes(
        bf.toBytes, bf.m, bf.k, probe.getBytes("UTF-8"))
      assert(viaStatic === bf.mightContain(probe))
    }
  }
}
