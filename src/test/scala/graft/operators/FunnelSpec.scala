package graft.operators

import graft.{SparkEntry, SparkSuite}

/** `e4_funnel`: the strict sequential view → click → purchase funnel.
  * Besides the DuckDB oracle, gate it against an independent driver-side
  * recomputation over the same events (small at sf0.001), and pin the
  * containment invariant each stage join enforces. */
class FunnelSpec extends SparkSuite {

  test("e4_funnel equals an independent per-user sequential recomputation") {
    val dir = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("e4_funnel")(spark, dir).collect()(0)

    val ev = Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(rows: Array[(Long, String, Long)], tpe: String,
        after: Long): Option[Long] = {
      val ts = rows.filter(r => r._2 == tpe && r._3 > after).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      firstAfter(rows, "view", Long.MinValue).foreach { tv =>
        nv += 1
        firstAfter(rows, "click", tv).foreach { tc =>
          nc += 1
          firstAfter(rows, "purchase", tc).foreach { _ => np += 1 }
        }
      }
    }
    assert(row.getAs[Long]("n_view") === nv)
    assert(row.getAs[Long]("n_click") === nc)
    assert(row.getAs[Long]("n_purchase") === np)
    // stage containment: each stage only counts users from the previous
    assert(nv >= nc && nc >= np && np > 0)
  }
}
