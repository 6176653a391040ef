package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** MMR rerank: a hand-built geometry where diversity provably overrides
  * relevance rank, plus the structural invariants the sim_mmr_verify gate
  * asserts at suite scale. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  private def embOf(vecs: Seq[(Long, Seq[Float])]): DataFrame =
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")

  // query 0 = (1,0,0). Candidates:
  //   1: a  = (0.9, 0.436, 0)      rel ≈ 0.899957   (rank 1)
  //   2: a2 = (0.9, 0.436, 0.001)  rel ≈ 0.899956   (near-duplicate of a)
  //   3: c  = (0.85, -0.527, 0)    rel ≈ 0.849908   (diverse: cos(c,a) ≈ 0.535)
  // Plain top-2 = {a, a2}. MMR λ=0.7 after picking a:
  //   score(a2) ≈ 0.7·0.9 − 0.3·1.0   ≈ 0.330
  //   score(c)  ≈ 0.7·0.85 − 0.3·0.535 ≈ 0.434  → MMR top-2 = {a, c}
  private val geo = embOf(Seq(
    0L -> Seq(1f, 0f, 0f),
    1L -> Seq(0.9f, 0.436f, 0f),
    2L -> Seq(0.9f, 0.436f, 0.001f),
    3L -> Seq(0.85f, -0.527f, 0f)))

  test("mmrRerank: diversity overrides the near-duplicate at rank 2") {
    val picks = Similarity.mmrRerank(geo, col("vec_id") === 0, n = 3,
      k = 2, lambda = 0.7)
      .orderBy("mmr_rank")
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(picks.map(p => (p._2, p._3)).toSeq === Seq((1, 1L), (2, 3L)))
    // first pick carries the plain top-1 relevance; rank-2's mmr score is
    // penalized below its raw relevance
    assert(picks(0)._4 > picks(1)._4)
    assert(picks(1)._5 < picks(1)._4)
  }

  test("mmrRerank: k beyond the candidate pool returns every candidate") {
    val picks = Similarity.mmrRerank(geo, col("vec_id") === 0, n = 3,
      k = 5, lambda = 0.7)
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(picks.length === 3)
    assert(picks.map(_._2).sorted.toSeq === Seq(1, 2, 3))
    assert(picks.map(_._3).toSet === Set(1L, 2L, 3L))
  }

  test("mmrRerank: lambda = 1 degenerates to plain top-k order") {
    val picks = Similarity.mmrRerank(geo, col("vec_id") === 0, n = 3,
      k = 3, lambda = 1.0)
      .orderBy("mmr_rank")
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(picks.map(_._3).toSeq === Seq(1L, 2L, 3L))
  }

  test("mmrVerify: gate is clean on the testdata embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val r = Similarity.mmrVerify(emb, col("vec_id") % 50 === 0, n = 10,
      k = 3, lambda = 0.7)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 > 0L)
    assert((r._2, r._3, r._4) === ((0L, 0L, 0L)))
  }
}
