package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Retrieval-scoring operators (TF-IDF, BM25) and sessionization — the
  * semantic invariants the DuckDB twins can't express as neatly. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry banana banana"),
    (3L, "cherry date elderberry fig"),
    (4L, "apple apple apple apple")
  ).toDF("doc_id", "text")

  test("tfidf: corpus-wide terms get idf 0; rare terms rank first") {
    val out = TextAnalysis.tfidfTopTerms(docs, topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(4)))
    // 'cherry' is in 3 of 4 docs -> low idf; 'date' appears only in doc 3
    // so it must outrank 'cherry' there
    val doc3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(doc3.head._3 !== "cherry")
    assert(Set("date", "elderberry", "fig").contains(doc3.head._3))
    // every doc has at most topK rows, ranks are 1..n with no gaps
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
    }
    // a term in EVERY doc would have idf = ln(1) = 0: add one and check
    val withCommon = docs.withColumn("text", concat(col("text"), lit(" zed")))
    val zed = TextAnalysis.tfidfTopTerms(withCommon, topK = 10)
      .where(col("term") === "zed").select("tfidf").as[Double].collect()
    assert(zed.nonEmpty && zed.forall(_ == 0.0))
  }

  test("bm25: more matching terms score higher; non-matching docs absent") {
    val out = TextAnalysis.bm25(docs, Seq("apple", "banana"), topK = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val byDoc = out.map(t => t._2 -> t._3).toMap
    // doc 3 has neither query term -> no row at all
    assert(!byDoc.contains(3L))
    // scores strictly ordered by rank
    val ranked = out.sortBy(_._1).map(_._3)
    assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b })
    // doc 1 matches both terms; saturation keeps single-term docs below it
    assert(out.sortBy(_._1).head._2 === 1L)
  }

  test("bm25: longer documents are penalized at equal tf") {
    val d = Seq(
      (1L, "apple pear"),
      (2L, "apple pear pear pear pear pear pear pear pear pear")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, Seq("apple"), topK = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L), s"short doc must outrank long at same tf: $out")
  }

  test("session_window semantics: the session interval is CLOSED at last+gap") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def plusMs(m: Long) = new java.sql.Timestamp(t0.getTime + m)
    val gapMs = 30L * 60000
    val ev = Seq(
      (1L, t0), (1L, plusMs(29 * 60000)),   // same session (gap < 30 min)
      (1L, plusMs(29 * 60000 + gapMs)),     // at EXACTLY last+gap -> merges
      (1L, plusMs(29 * 60000 + 2 * gapMs + 1)), // 1 ms past the gap -> new
      (2L, t0)
    ).toDF("user_id", "event_time")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count("*").as("n"))
      .groupBy("user_id").agg(count("*").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(sessions(1L) === 2L)
    assert(sessions(2L) === 1L)
  }

  test("dynamic-gap session_window: each event extends by ITS OWN gap") {
    // user 1: a 'short' event (15-min gap) followed 20 min later -> the
    // first event's window closed at +15, so a NEW session; user 2: a
    // 'long' event (45-min gap) followed 20 min later -> merges. The
    // e7 oracle models exactly this running-max-of-own-ends rule.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def plusMin(m: Long) = new java.sql.Timestamp(t0.getTime + m * 60000)
    val ev = Seq(
      (1L, t0, "15 minutes"), (1L, plusMin(20), "15 minutes"),
      (2L, t0, "45 minutes"), (2L, plusMin(20), "45 minutes")
    ).toDF("user_id", "event_time", "gap")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("event_time"), col("gap")))
      .agg(count("*").as("n"))
      .groupBy("user_id").agg(count("*").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(sessions(1L) === 2L, "15-min gap must split a 20-min pause")
    assert(sessions(2L) === 1L, "45-min gap must bridge a 20-min pause")
  }
}
