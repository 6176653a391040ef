package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Multimodal.{MediaRecord, frameSize, maxFrames}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media(rows: (Long, String, Array[Byte])*) =
    rows.toDF("media_id", "modality", "payload")

  private def bytes(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)

  test("frames: exact slicing incl. short last frame and the caps") {
    val df = media(
      (1L, "image", bytes(10)),                    // 1 short frame
      (2L, "image", bytes(frameSize)),             // exactly 1 full frame
      (3L, "image", bytes(frameSize + 1)),         // full + 1-byte frame
      (4L, "video", bytes(frameSize * maxFrames + 99)), // capped at maxFrames
      (5L, "audio", Array.emptyByteArray))         // one empty frame
    val got = df.select($"media_id", Multimodal.frames($"payload").as("fr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(got(1L).map(_.length) === Seq(10))
    assert(got(1L).head === bytes(10))
    assert(got(2L).map(_.length) === Seq(frameSize))
    assert(got(3L).map(_.length) === Seq(frameSize, 1))
    assert(got(3L)(1) === Array(frameSize.toByte))
    assert(got(4L).map(_.length) === Seq.fill(maxFrames)(frameSize))
    assert(got(5L).map(_.length) === Seq(0))
  }

  test("decodeBatch (mapPartitions path) agrees with the column path") {
    val df = media(
      (1L, "image", bytes(100)), (2L, "audio", bytes(257)), (3L, "video", bytes(3)))
    val typed = Multimodal.decodeBatch(df.as[MediaRecord])
      .select($"media_id", $"meta.width", $"meta.height", $"meta.channels")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val cols = Multimodal.attachMeta(df)
      .select($"media_id", $"meta.width", $"meta.height", $"meta.channels")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(typed === cols)
    assert(typed.contains((1L, 1 + 100 * 31 % 1024, 1 + 100 * 17 % 1024, 1)))
  }

  test("resizeCrop bounds payloads; featurize emits fixed-dim unit-range floats") {
    val df = media((1L, "image", bytes(500)), (2L, "image", bytes(8)))
    val cropped = df.select(octet_length(Multimodal.resizeCrop($"payload", 64)))
      .as[Int].collect().toSet
    assert(cropped === Set(64, 8))
    val feats = Multimodal.featurize(df, dim = 16)
      .select($"features").as[Seq[Float]].collect()
    assert(feats.forall(_.length === 16))
    assert(feats.forall(_.forall(f => f >= -1.0f && f <= 1.0f)))
    // deterministic
    val again = Multimodal.featurize(df, dim = 16)
      .select($"features").as[Seq[Float]].collect()
    assert(feats.map(_.toList).toSet === again.map(_.toList).toSet)
  }

  test("repartitionForDecode sizes partitions by row count") {
    val df = media((1 to 100).map(i => (i.toLong, "image", bytes(i))): _*)
    val rp = Multimodal.repartitionForDecode(df, rowsPerPartition = 10)
    assert(rp.rdd.getNumPartitions === 10)
  }

  test("aHash: mean-threshold bits, exact buckets, short docs excluded") {
    // 62 × 'a' (97) + 'z' (122): mean = (62·97 + 122)/63 ≈ 97.397 — only
    // the last pixel (index 62) exceeds it -> hash = 2^62, popcount 1.
    val hot = "a" * 62 + "z"
    val docs = Seq(
      (1L, hot), (2L, hot),          // exact perceptual duplicates
      (3L, "z" + "a" * 62),          // same pixels, different position ->
                                      // bit 0, not bit 62
      (4L, "too short"))             // < 63 chars: excluded
      .toDF("doc_id", "text")
    val r = Multimodal.aHash(docs)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(r === Seq(
      (1L, 1L << 62, 1, 2L),
      (2L, 1L << 62, 1, 2L),
      (3L, 1L, 1, 1L)))
  }

  test("pHash: quantized DCT basis rows sum to zero, so a flat grid " +
      "hashes to 0 and a global brightness shift is invisible") {
    // symmetry r ↔ 7−r negates each rounded cosine exactly for every
    // u ≠ 0, so Σ_r cos_q(r,u) = 0 — the AC spectrum of a constant
    // grid is exactly zero, and adding a constant to every pixel
    // leaves every AC coefficient (hence the hash) unchanged
    for (u <- 1 until 8)
      assert((0 until 8).map(r => Multimodal.pHashCos(r * 8 + u)).sum === 0L)
    val pattern = "abcdmnop" * 8
    val shifted = pattern.map(c => (c + 1).toChar).mkString // +1 brightness
    val docs = Seq(
      (1L, "a" * 64),               // flat grid
      (2L, pattern), (3L, pattern), // perceptual duplicates
      (4L, shifted),                // brightness-shifted copy of 2/3
      (5L, "too short"))            // < 64 chars: excluded
      .toDF("doc_id", "text")
    val r = Multimodal.pHash(docs)
      .as[(Long, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(r.map(_._1) === Seq(1L, 2L, 3L, 4L))
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L)._2 === 0L)      // flat -> zero spectrum -> hash 0
    assert(byId(2L) === byId(3L).copy(_1 = 2L)) // duplicates share hash
    assert(byId(4L)._2 === byId(2L)._2) // brightness shift: same hash
    assert(byId(2L)._4 === 3L)      // 2, 3, and the shifted 4 bucket
    assert(byId(4L)._4 === 3L)      // together on the identical hash
  }

  test("pHash: matches an independent plain-Scala reference transform") {
    val text = "The quick brown fox jumps over the lazy dog! 0123456789abcdef"
      .padTo(64, 'x').mkString
    def reference(t: String): (Long, Int) = {
      val px = t.take(64).map(_.toLong)
      val coefs = (1 until 64).map { k =>
        (0 until 64).map { i =>
          px(i) * Multimodal.pHashWeights((k - 1) * 64 + i)
        }.sum
      }
      val med = coefs.sorted.apply(31)
      val hash = coefs.zipWithIndex.collect {
        case (c, idx) if c > med => 1L << idx
      }.sum
      (hash, java.lang.Long.bitCount(hash))
    }
    val (expHash, expOnes) = reference(text)
    val got = Multimodal.pHash(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Int, Long)].collect().head
    assert(got === ((1L, expHash, expOnes, 1L)))
    assert(expHash !== 0L) // the fixture is non-degenerate
  }

  test("videoNearDup: shared-frame pairs, threshold, stop-frame cap, " +
      "modality filter") {
    // frame block P(k): first k chars 'z', rest 'a' — 64 chars whose
    // aHash has exactly the first k bits set (k strictly between 0 and
    // 63 keeps the mean strictly between the two levels), so distinct k
    // give distinct frame hashes
    def P(k: Int) = "z" * k + "a" * (64 - k)
    val d = Seq(
      (2L, P(10) + P(20) + P(30)),  // video
      (5L, P(10) + P(20) + P(40)),  // video: shares 2 frames with vid 2
      (8L, P(30) + P(50)),          // video: shares only 1 with vid 2
      (11L, P(50) + P(40) + P(10)), // video: shares 2 with vid 5
      (3L, P(10) + P(20) + P(30)))  // doc 3 % 3 = 0 -> image: excluded
      .toDF("doc_id", "text")
    val got = Multimodal.videoNearDup(d, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 5L, 2L), (5L, 11L, 2L)))
    // stop-frame cap: P(10) appears in 3 videos; at maxDf = 2 it drops,
    // leaving every pair below the threshold
    val capped = Multimodal.videoNearDup(d, minShared = 2, maxDf = 2)
      .collect()
    assert(capped.isEmpty,
      s"stop-frame removal must break both pairs: ${capped.toSeq}")
  }

  test("videoNearDup: sub-frame videos and a video-free corpus yield " +
      "empty results, not failures") {
    // doc 2 is a video but shorter than one complete frame; doc 3 is an
    // image — no video ever reaches the frame explode
    val d = Seq((2L, "too short"), (3L, "z" * 200))
      .toDF("doc_id", "text")
    assert(Multimodal.videoNearDup(d).collect().isEmpty)
  }

  // audio frame with peak band b: 'z's in band b, 'a's elsewhere —
  // peak energy 8·122 = 976 (quant 61 % 16 = 13), others 8·97 = 776
  private def F(b: Int): String =
    (0 until 4).map(j => if (j == b) "z" * 8 else "a" * 8).mkString

  test("audioFingerprint: aligned landmark runs vote on their offset; " +
      "disjoint runs and non-audio docs never pair") {
    val d = Seq(
      (1L, F(0) + F(1) + F(2) + F(3)),        // track A: landmarks (0,1)(1,2)(2,3)
      (4L, F(2) + F(0) + F(1) + F(2) + F(3)), // track B: A's run shifted +1
      (7L, F(3) + F(2) + F(1) + F(0)),        // track C: reversed -> disjoint
      (2L, F(0) + F(1) + F(2) + F(3)))        // doc 2 % 3 = 2 -> video: excluded
      .toDF("doc_id", "text")
    val got = Multimodal.audioFingerprint(d, minAligned = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // A's three landmarks all land in B one frame later: offset -1, 3 votes
    assert(got === Set((1L, 4L, 3L, -1L)))
    // stop-fingerprint cap: at maxDf = 1 every shared fp is dropped
    assert(Multimodal.audioFingerprint(d, minAligned = 3, maxDf = 1)
      .collect().isEmpty)
  }

  test("audioFingerprint: sub-frame tracks and an audio-free corpus " +
      "yield empty results, not failures") {
    val d = Seq((1L, "too short"), (3L, "z" * 200))
      .toDF("doc_id", "text")
    assert(Multimodal.audioFingerprint(d).collect().isEmpty)
  }
}
