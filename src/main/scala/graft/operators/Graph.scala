package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the event stream — the capability class the engine
  * lacked: degree profiles, triangle counting, and PageRank, all derived
  * from a user-interaction graph the pipeline itself defines.
  *
  * Edge semantics (shared verbatim by the DuckDB oracles): within each
  * HOUR BUCKET of the event stream, consecutive events (ordered by
  * `(ts, event_id)`) whose users differ contribute a directed edge
  * `prev_user -> next_user`; edges are DISTINCT, self-loops dropped.
  * The hour-bucket partitioning is the scale contract: a GLOBAL
  * `lead()` would funnel 100 TB of events through one window partition,
  * while the bucketed window parallelizes by hour at the documented
  * cost of dropping the one boundary transition per bucket. The same
  * trade is standard in sessionization (e2) and sliding windows (e6).
  *
  * Scale posture of the three consumers:
  *  - degree: one groupBy per direction over 16-byte edge rows — a pair
  *    of partial/final aggregates, no text, no skew beyond AQE's reach.
  *  - triangles: edges are ORIENTED from the (degree, node)-smaller
  *    endpoint to the larger before the wedge join, the classic
  *    bound that caps per-node wedge fan-out at O(sqrt(m)) even on
  *    power-law graphs (a raw wedge join on a hub node is quadratic in
  *    its degree). The oracle counts the same triangles with the
  *    simpler node-id orientation — the COUNT is orientation-invariant.
  *  - PageRank: rank is a node-keyed relation, never a driver array —
  *    each iteration is (edges join ranks) shuffled on src, an
  *    aggregate on dst, and a one-row dangling-mass scalar
  *    cross-joined back in (the repo's bounded scalar-broadcast
  *    contract). Iterations materialize via persist so the lineage
  *    stays shallow; node count and iteration count are the only
  *    driver scalars.
  */
object Graph {

  /** Directed distinct edges `(src, dst)` per the hour-bucket contract. */
  def edges(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(expr("ts div 3600000000000"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("ts"), col("event_id"), col("user_id").as("src"),
        lead(col("user_id"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull && col("dst") =!= col("src"))
      .select("src", "dst").distinct()
  }

  /** Undirected distinct edges with `a < b`. */
  def undirected(events: DataFrame): DataFrame =
    edges(events)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Per-node degree profile: out/in over the directed edges, und over
    * the undirected ones. Nodes = every endpoint. */
  def degrees(events: DataFrame): DataFrame = {
    val ed = edges(events).persist()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
    val outDeg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inDeg = ed.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    val und = ed.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val undDeg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("und_deg"))
    nodes.join(outDeg, Seq("node"), "left")
      .join(inDeg, Seq("node"), "left")
      .join(undDeg, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("und_deg"), lit(0L)).as("und_deg"))
      .orderBy("node")
  }

  /** One-row graph census: nodes, undirected edges, triangles. The
    * triangle join orients every undirected edge from the
    * `(und_deg, node)`-lexicographically smaller endpoint to the larger
    * (total order, so each triangle survives as exactly one oriented
    * path x->y->z plus its closing edge x->z), then counts wedges that
    * close. Orientation by degree bounds wedge fan-out; the count is
    * identical to the oracle's node-id orientation. */
  def triangles(events: DataFrame): DataFrame = {
    val und = undirected(events).persist()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // (deg, node) total order as a single sortable key: degree is < 2^20
    // at any realistic per-hour fan-in, node ids are longs — pack exact
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")).persist()
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y"))
    val e2 = oriented.select(col("src").as("y"), col("dst").as("z"))
    val e3 = oriented.select(col("src").as("x"), col("dst").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    val census = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
    census
  }

  /** PageRank over the directed graph, `iters` synchronous iterations at
    * damping `d`, dangling mass redistributed uniformly:
    * `r'(v) = (1-d)/n + d * (sum_{u->v} r(u)/out(u) + dangling/n)`.
    * Emits `(node, rank)` rounded to 9 decimals (double noise from
    * engine-specific summation order sits below 1e-15 relative — see the
    * oracle, which unrolls the identical recurrence in SQL). */
  def pagerank(events: DataFrame, iters: Int = 3, d: Double = 0.85): DataFrame = {
    val spark = events.sparkSession
    val ed = edges(events).persist()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count() // the one driver scalar: node count
    val outDeg = ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist()
    // initial uniform rank: persisted but NOT pre-materialized — it is a
    // literal projection over the cached node set, cheaper to let the
    // first iteration's job populate than to pay a dedicated action
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank")).persist()
    (1 to iters).foreach { _ =>
      // dangling mass: one row, cross-joined (scalar broadcast)
      val dang = rank.join(outDeg, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dang"))
      val contrib = ed.join(rank, ed("src") === rank("node"))
        .join(outDeg.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit((1.0 - d) / n) + lit(d) *
            (coalesce(col("contrib"), lit(0.0)) + col("dang") / lit(n.toDouble)))
            .as("rank"))
        .persist()
      next.count() // materialize so lineage stays one iteration deep
      rank.unpersist()
      rank = next
    }
    rank.select(col("node"), round(col("rank"), 9).as("rank")).orderBy("node")
  }
}

/** DuckDB oracle SQL for the graph lane — the identical edge contract and
  * recurrences, expressed portably. */
object GraphSql {

  /** Shared edge CTEs (directed distinct + undirected `a<b`). */
  val edgeCtes: String =
    """seq AS (
      |  SELECT user_id AS src,
      |         lead(user_id) OVER (PARTITION BY epoch_ns(ts) // 3600000000000
      |                             ORDER BY epoch_ns(ts), event_id) AS dst
      |  FROM events),
      |ed AS (SELECT DISTINCT src, dst FROM seq
      |       WHERE dst IS NOT NULL AND dst <> src),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM ed)""".stripMargin

  val degrees: String =
    s"""WITH $edgeCtes,
       |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |od AS (SELECT src AS node, count(*) AS out_deg FROM ed GROUP BY 1),
       |id AS (SELECT dst AS node, count(*) AS in_deg FROM ed GROUP BY 1),
       |ud AS (SELECT node, count(*) AS und_deg FROM
       |         (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
       |       GROUP BY 1)
       |SELECT n.node,
       |       coalesce(od.out_deg, 0) AS out_deg,
       |       coalesce(id.in_deg, 0) AS in_deg,
       |       coalesce(ud.und_deg, 0) AS und_deg
       |FROM nodes n
       |LEFT JOIN od ON od.node = n.node
       |LEFT JOIN id ON id.node = n.node
       |LEFT JOIN ud ON ud.node = n.node
       |ORDER BY n.node""".stripMargin

  /** Node-id orientation `a<b<c`: each triangle counted exactly once. */
  val triangles: String =
    s"""WITH $edgeCtes,
       |tri AS (SELECT count(*) AS n_triangles
       |        FROM und e1
       |        JOIN und e2 ON e2.a = e1.b
       |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
       |SELECT (SELECT count(*) FROM
       |          (SELECT a AS node FROM und UNION SELECT b FROM und)) AS n_nodes,
       |       (SELECT count(*) FROM und) AS n_edges,
       |       tri.n_triangles
       |FROM tri""".stripMargin

  /** The PageRank recurrence unrolled: pr0 = 1/n, then `iters` chained
    * CTE steps of the identical dangling-aware update. */
  def pagerank(iters: Int = 3, d: Double = 0.85): String = {
    val steps = (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""pr$i AS (
         |  SELECT n.node,
         |         (1 - $d) / cnt.n + $d * (
         |           coalesce(c.contrib, 0) +
         |           (SELECT coalesce(sum(p.rank), 0) FROM $prev p
         |            LEFT JOIN od o ON o.node = p.node
         |            WHERE o.node IS NULL) / cnt.n) AS rank
         |  FROM nodes n CROSS JOIN cnt
         |  LEFT JOIN (SELECT e.dst AS node, sum(p.rank / o.deg) AS contrib
         |             FROM ed e
         |             JOIN pr${i - 1} p ON p.node = e.src
         |             JOIN od o ON o.node = e.src
         |             GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |od AS (SELECT src AS node, count(*) AS deg FROM ed GROUP BY 1),
       |pr0 AS (SELECT node, 1.0 / cnt.n AS rank FROM nodes CROSS JOIN cnt),
       |$steps
       |SELECT node, round(rank, 9) AS rank FROM pr$iters ORDER BY node""".stripMargin
  }
}
