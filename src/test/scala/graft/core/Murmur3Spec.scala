package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import scala.util.Random

class Murmur3Spec extends AnyFunSuite {

  test("published murmur3_x86_32 test vectors") {
    // Vectors from the canonical smhasher suite / mmh3 docs (signed Int).
    assert(Murmur3.hashString("", 0) === 0)
    assert(Murmur3.hashString("", 1) === 0x514e28b7)
    assert(Murmur3.hashString("a", 0) === 0x3c2569b2)
    assert(Murmur3.hashString("abc", 0) === 0xb3dd93fa)
    assert(Murmur3.hashString("hello", 0) === 0x248bfa47)
    assert(
      Murmur3.hashString("The quick brown fox jumps over the lazy dog", 0)
        === 0x2e4ff723)
  }

  test("matches Guava murmur3_32_fixed on random byte arrays and seeds") {
    val rnd = new Random(42)
    for (_ <- 0 until 500) {
      val data = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(data)
      val seed = rnd.nextInt()
      val guava = com.google.common.hash.Hashing.murmur3_32_fixed(seed)
        .hashBytes(data).asInt()
      assert(Murmur3.hashBytes(data, seed) === guava,
        s"mismatch for len=${data.length} seed=$seed")
    }
  }

  test("matches Guava on UTF-8 strings (incl. multibyte)") {
    val strings = Seq("tt0000001", "héllo wörld", "日本語テキスト", "emoji 🎬🎥", "x", "")
    for (s <- strings; seed <- 0 to 10) {
      val guava = com.google.common.hash.Hashing.murmur3_32_fixed(seed)
        .hashBytes(s.getBytes(StandardCharsets.UTF_8)).asInt()
      assert(Murmur3.hashString(s, seed) === guava, s"mismatch for '$s' seed=$seed")
    }
  }

  test("index is always in [0, m) even for negative hashes") {
    val rnd = new Random(7)
    for (_ <- 0 until 2000) {
      val s = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val m = 1 + rnd.nextInt(1000000)
      val idx = Murmur3.index(s.getBytes(StandardCharsets.UTF_8), rnd.nextInt(20), m)
      assert(idx >= 0 && idx < m)
    }
  }
}
