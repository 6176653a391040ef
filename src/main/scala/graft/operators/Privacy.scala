package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular disclosure-risk auditing — the privacy lane's structured
  * complement to the text-side PII scrub (t10): before a table with
  * quasi-identifiers is released (or joined into a training corpus), the
  * pipeline must know how re-identifiable its rows are and, if counts are
  * published, how much noise buys a stated privacy budget.
  *
  * Two capabilities:
  *  - [[kAnonymityLadder]]: k-anonymity / l-diversity measured across a
  *    GENERALIZATION LADDER (coarser and coarser account-balance bands) —
  *    the privacy-vs-utility curve an anonymization pass tunes against
  *    (Sweeney 2002 for k-anonymity; Machanavajjhala et al. 2007 for
  *    l-diversity). Exact, SQL-expressible, oracle-checked.
  *  - [[dpCounts]] / [[dpVerify]]: ε-differentially-private released
  *    counts via the Laplace mechanism (Dwork et al. 2006, sensitivity 1
  *    for counting queries), with the noise draw DERIVED DETERMINISTICALLY
  *    from a seeded 64-bit hash of the group key so the release is
  *    reproducible and the verify gate can re-derive it bit-for-bit.
  *
  * Scale posture: every aggregate here is a two-stage (partial/final)
  * group-by whose key cardinality is bounded by the quasi-identifier
  * domain (nations × balance bands, or market segments) — never by row
  * count. At 100 TB the map-side combine absorbs the volume and the final
  * exchange carries one row per group. No window functions, no driver
  * actions, no text on any exchange.
  */
object Privacy {

  /** k-anonymity / l-diversity audit of the customer table across a
    * generalization ladder of balance-band widths.
    *
    * Per rung (one output row, ordered by `band_width`):
    *  - `n_groups`    — distinct quasi-identifier groups
    *  - `k_anonymity` — the MINIMUM group size (the table "is"
    *    k-anonymous for this k: every row hides among ≥ k-1 others)
    *  - `l_diversity` — the minimum count of DISTINCT sensitive values
    *    (market segment) within any group: a group can be large yet leak
    *    its members' segment if all rows share one value
    *  - `groups_below_k` / `rows_at_risk` — how many groups (and rows)
    *    fall under the release threshold `k`
    *
    * Wider bands → fewer, larger groups → higher k at lower utility; the
    * ladder IS that trade-off, measured.
    *
    * One scan for the whole ladder: each row explodes across the rung
    * widths BEFORE the group-by, so the 100 TB table is read once, not
    * once per rung. The explode multiplies rows only inside the map task
    * — the partial aggregate combines to one row per
    * `(width, nation, band, segment)` before the exchange, so shuffle
    * volume stays bounded by the QI domain, not by row count. */
  def kAnonymityLadder(customer: DataFrame, widths: Seq[Int],
      k: Int): DataFrame =
    customer
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .withColumn("band_width",
        explode(lit(widths.map(_.toLong).toArray)))
      .groupBy(col("band_width"), col("c_nationkey"),
        floor(col("c_acctbal") / col("band_width")).cast("long").as("band"))
      .agg(count(lit(1)).as("sz"),
        countDistinct(col("c_mktsegment")).as("ndist"))
      .groupBy(col("band_width"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("sz")).as("k_anonymity"),
        min(col("ndist")).as("l_diversity"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("rows_at_risk"))
      .orderBy("band_width")

  /** k-anonymity ENFORCEMENT — the release [[kAnonymityLadder]] audits
    * for: every row whose quasi-identifier group (nation × balance band
    * at `width`) holds at least `k` members survives, carrying only its
    * generalized QI (the band, never the raw balance) and the group size
    * it hides in; rows in smaller groups are suppressed. The classic
    * suppression-based release (Sweeney 2002 §3): generalize first
    * (banding), suppress what generalization can't save.
    *
    * Shape: one bounded group-by builds the QI-group size relation
    * (≤ nations × bands rows — broadcastable at any corpus size), one
    * equi-join tags each row, one filter drops the at-risk rows. The
    * 100 TB release is a single scan + broadcast join; nothing row-scaled
    * shuffles. `(c_custkey, c_nationkey, band, grp_size)`. */
  def kSuppress(customer: DataFrame, width: Int, k: Int): DataFrame = {
    val banded = customer.select(col("c_custkey"), col("c_nationkey"),
      floor(col("c_acctbal") / width).cast("long").as("band"))
    val groups = banded.groupBy("c_nationkey", "band")
      .agg(count(lit(1)).as("grp_size"))
    banded.join(broadcast(groups), Seq("c_nationkey", "band"))
      .where(col("grp_size") >= k)
      .select("c_custkey", "c_nationkey", "band", "grp_size")
      .orderBy("c_custkey")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the disclosure ladder after k-anonymity and l-diversity: a
    * group can be large (high k) and diverse (high l) yet still leak if
    * its SENSITIVE-VALUE DISTRIBUTION diverges from the table's (e.g. a
    * group that is 90% one segment against a uniform global). Per
    * quasi-identifier group (nation × balance band at `width`): the
    * group size and the total-variation distance between the group's
    * segment distribution and the global one, with `pass = tvd ≤ t`
    * (rounded BEFORE thresholding, the repo convention).
    *
    * TVD over the full segment domain folds to group-present cells only:
    * `0.5·(Σ_{v∈grp} |p_grp − p_glob| + 1 − Σ_{v∈grp} p_glob)` — the
    * absent segments' contribution is the global mass the group never
    * covers, so no domain spine is needed.
    *
    * EXACT-INTEGER TVD (ADVICE r10 #2): `p_grp − p_glob =
    * (n·n_tot − n_seg·n_grp)/(n_grp·n_tot)`, so the per-cell |Δ| terms
    * sum as EXACT integers over the group's common denominator, and the
    * absent-segment mass `1 − Σ p_glob` folds to
    * `(n_tot − Σ n_seg)·n_grp` over the same denominator. ONE double
    * division happens at the very end, so partial-aggregation order
    * cannot move the value by an ulp (the repo's summation-order
    * independence convention). Accumulation is DECIMAL(38,0) ⇔ DuckDB
    * HUGEINT — `n·n_tot` is rows², past int64 at 100 TB row counts.
    *
    * Scale posture: one fact shuffle to the bounded `(nation, band,
    * segment)` cell relation (persisted; margins are second-level
    * aggregates — the fe4 pattern), margins broadcast back. */
  def tCloseness(customer: DataFrame, width: Int, t: Double): DataFrame = {
    val base = customer.select(col("c_nationkey"),
      floor(col("c_acctbal") / width).cast("long").as("band"),
      col("c_mktsegment").as("seg"))
    val cell = base.groupBy("c_nationkey", "band", "seg")
      .agg(count(lit(1)).as("n")).persist()
    val grp = cell.groupBy("c_nationkey", "band").agg(sum("n").as("n_grp"))
    val glob = cell.groupBy("seg").agg(sum("n").as("n_seg"))
    val tot = cell.agg(sum("n").as("n_tot"))
    val dNum = abs(col("n").cast("decimal(38,0)") * col("n_tot")
      - col("n_seg").cast("decimal(38,0)") * col("n_grp"))
    cell.join(broadcast(grp), Seq("c_nationkey", "band"))
      .join(broadcast(glob), "seg")
      .crossJoin(tot)
      .groupBy(col("c_nationkey"), col("band"), col("n_grp"), col("n_tot"))
      .agg(sum(dNum).as("a_num"),
        sum(col("n_seg").cast("decimal(38,0)")).as("b_seg"))
      .select(col("c_nationkey"), col("band"),
        col("n_grp").cast("long").as("n_grp"),
        round((col("a_num")
            + (col("n_tot").cast("decimal(38,0)") - col("b_seg"))
              * col("n_grp")).cast("double")
          / (lit(2.0) * col("n_grp").cast("double")
            * col("n_tot").cast("double")), 6).as("tvd"))
      .select(col("c_nationkey"), col("band"), col("n_grp"), col("tvd"),
        (col("tvd") <= t).as("pass"))
      .orderBy("c_nationkey", "band")
  }

  /** Entropy l-diversity audit (Machanavajjhala et al. 2007 §4) — the
    * strict form of the l-diversity the ladder ([[kAnonymityLadder]])
    * reports as a distinct-count: a group holding l distinct sensitive
    * values can still be 99% one value, so the DISTRIBUTION must carry
    * at least `ln(l)` of Shannon entropy. Per quasi-identifier group
    * (nation × balance band at `width`): size, distinct sensitive
    * count, `entropy_l = exp(H)` (the "effective number of segments"),
    * and `pass = entropy_l ≥ l` — rounded BEFORE the threshold per the
    * repo convention.
    *
    * Cross-engine determinism: H = ln(n) − (Σ_v c_v·ln c_v)/n folds the
    * per-cell probabilities out of the logs, so the only order-sensitive
    * piece is the per-group sum of `c·ln(c)` terms. Each term is
    * QUANTIZED to a BIGINT at 1e6 scale (the fe11 quantized-cell
    * convention: an engine ulp in `ln` moves the pre-round value by
    * ~1e-10 of a grid step), the integers sum exactly in any order, and
    * ONE float expression at the end rebuilds H and exponentiates.
    *
    * Scale posture: one fact shuffle to the bounded
    * `(nation, band, segment)` cell relation; everything after is
    * arithmetic on cells. No window, no join, no driver action. */
  def entropyLDiversity(customer: DataFrame, width: Int,
      l: Double): DataFrame = {
    val cell = customer.select(col("c_nationkey"),
        floor(col("c_acctbal") / width).cast("long").as("band"),
        col("c_mktsegment").as("seg"))
      .groupBy("c_nationkey", "band", "seg")
      .agg(count(lit(1)).as("c"))
    val term = round(col("c").cast("double") *
      log(col("c").cast("double")) * lit(1e6)).cast("long")
    cell.groupBy("c_nationkey", "band")
      .agg(sum(col("c")).as("n_grp"),
        count(lit(1)).as("l_distinct"),
        sum(term).as("sq"))
      .select(col("c_nationkey"), col("band"), col("n_grp"),
        col("l_distinct"),
        round(exp(log(col("n_grp").cast("double"))
          - col("sq").cast("double")
            / (col("n_grp").cast("double") * lit(1e6))), 6)
          .as("entropy_l"))
      .withColumn("pass", col("entropy_l") >= l)
      .orderBy("c_nationkey", "band")
  }

  /** Laplace(0, 1/ε) noise derived deterministically from
    * `xxhash64(key, seed)`: the low 52 hash bits map to a uniform
    * u ∈ (0,1) (offset by 2⁻⁵³ so u is never exactly 0, 1, or ½ away
    * from the branch point), then the standard inverse-CDF transform
    * `-b·sign(u-½)·ln(1-2|u-½|)`. Same-seed re-derivation is what makes
    * [[dpVerify]] an exact gate instead of a statistical one. */
  private def laplaceNoise(key: Column, epsilon: Double,
      seed: Int): Column = {
    val u = (pmod(xxhash64(key, lit(seed)), lit(1L << 52)).cast("double") /
      lit((1L << 52).toDouble)) + lit(math.pow(2, -53))
    val centered = u - lit(0.5)
    val b = 1.0 / epsilon
    -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
  }

  /** ε-DP released counts per market segment: exact count + seeded
    * Laplace(1/ε) noise (count queries have sensitivity 1). The exact
    * count never appears in the output — only the noisy release and the
    * budget it was released under. Deterministic given (ε, seed). */
  def dpCounts(customer: DataFrame, epsilon: Double,
      seed: Int): DataFrame =
    customer.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("exact"))
      .select(col("c_mktsegment"),
        round(col("exact") + laplaceNoise(col("c_mktsegment"), epsilon, seed),
          6).as("noisy_count"),
        lit(epsilon).as("epsilon"))
      .orderBy("c_mktsegment")

  /** Exact gate for [[dpCounts]] (the release itself is `no_oracle` —
    * its values are noise by design). Re-derives the same seeded noise
    * and checks, over ALL groups:
    *  - `n_groups` — real oracle value (distinct market segments)
    *  - `n_bound_violations` — groups where |noisy − exact| exceeds the
    *    Laplace tail bound ln(n/δ)/ε at δ = 10⁻⁶ (a fixed, deterministic
    *    threshold; the seeded draw either clears it forever or never)
    *  - `n_rederive_mismatch` — groups where the released noisy count
    *    differs from the re-derivation (seed / rounding drift detector)
    */
  def dpVerify(customer: DataFrame, epsilon: Double, seed: Int): DataFrame = {
    val released = dpCounts(customer, epsilon, seed)
      .select(col("c_mktsegment"), col("noisy_count"))
    val exact = customer.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("exact"))
    val joined = exact.join(released, Seq("c_mktsegment"))
      .select(col("exact"), col("noisy_count"),
        round(col("exact") +
          laplaceNoise(col("c_mktsegment"), epsilon, seed), 6)
          .as("rederived"))
    // the Laplace union tail bound ln(n/δ)/ε uses the MEASURED group
    // count (r8 advice: a hardcoded domain size mis-scales the bound on
    // any other quasi-identifier domain), derived in the same aggregate —
    // a one-row scalar cross-joined back, the repo's bounded-broadcast
    // contract
    val ng = exact.agg(count(lit(1)).cast("double").as("ng"))
    joined.crossJoin(broadcast(ng))
      .withColumn("bound", log(col("ng") / lit(1e-6)) / lit(epsilon))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(abs(col("noisy_count") - col("exact")) > col("bound"), 1L)
          .otherwise(0L)).as("n_bound_violations"),
        sum(when(col("noisy_count") =!= col("rederived"), 1L).otherwise(0L))
          .as("n_rederive_mismatch"))
  }
}

/** DuckDB twins for the oracle-checkable faces. */
object PrivacySql {

  /** Twin of [[Privacy.kAnonymityLadder]] — same bands, same thresholds.
    * DuckDB `sum` returns HUGEINT/DOUBLE; cast to BIGINT to match Spark's
    * long. */
  def kAnonymityLadder(widths: Seq[Int], k: Int): String =
    widths.map { w =>
      s"""SELECT CAST($w AS BIGINT) AS band_width,
         |       count(*) AS n_groups,
         |       min(sz) AS k_anonymity,
         |       min(ndist) AS l_diversity,
         |       CAST(sum(CASE WHEN sz < $k THEN 1 ELSE 0 END) AS BIGINT)
         |         AS groups_below_k,
         |       CAST(sum(CASE WHEN sz < $k THEN sz ELSE 0 END) AS BIGINT)
         |         AS rows_at_risk
         |FROM (SELECT count(*) AS sz,
         |             count(DISTINCT c_mktsegment) AS ndist
         |      FROM customer
         |      GROUP BY c_nationkey,
         |               CAST(floor(c_acctbal / $w) AS BIGINT))""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY band_width")

  /** Twin of [[Privacy.kSuppress]] — same bands, same group floor. */
  def kSuppress(width: Int, k: Int): String =
    s"""WITH g AS (SELECT c_nationkey,
       |                  CAST(floor(c_acctbal / $width) AS BIGINT) AS band,
       |                  count(*) AS grp_size
       |           FROM customer GROUP BY 1, 2)
       |SELECT c.c_custkey, c.c_nationkey,
       |       CAST(floor(c.c_acctbal / $width) AS BIGINT) AS band,
       |       g.grp_size
       |FROM customer c
       |JOIN g ON g.c_nationkey = c.c_nationkey
       |      AND g.band = CAST(floor(c.c_acctbal / $width) AS BIGINT)
       |WHERE g.grp_size >= $k
       |ORDER BY c.c_custkey""".stripMargin

  /** Twin of [[Privacy.tCloseness]]: identical EXACT-INTEGER folded-TVD
    * arithmetic — HUGEINT numerators (⇔ Spark DECIMAL(38,0)) summed over
    * the common denominator, ONE double division at the end — and
    * identical rounding-before-threshold. */
  def tCloseness(width: Int, t: Double): String =
    s"""WITH base AS (
       |  SELECT c_nationkey,
       |         CAST(floor(c_acctbal / $width) AS BIGINT) AS band,
       |         c_mktsegment AS seg
       |  FROM customer),
       |cell AS (SELECT c_nationkey, band, seg, count(*) AS n
       |         FROM base GROUP BY 1, 2, 3),
       |grp AS (SELECT c_nationkey, band, CAST(sum(n) AS BIGINT) AS n_grp
       |        FROM cell GROUP BY 1, 2),
       |gl AS (SELECT seg, CAST(sum(n) AS BIGINT) AS n_seg
       |        FROM cell GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM cell),
       |tv AS (
       |  SELECT cell.c_nationkey, cell.band, grp.n_grp,
       |         round(CAST(sum(abs(CAST(cell.n AS HUGEINT) * tot.n_tot
       |                            - CAST(gl.n_seg AS HUGEINT) * grp.n_grp))
       |                    + (CAST(tot.n_tot AS HUGEINT)
       |                       - sum(CAST(gl.n_seg AS HUGEINT))) * grp.n_grp
       |                    AS DOUBLE)
       |           / (CAST(2.0 AS DOUBLE) * CAST(grp.n_grp AS DOUBLE)
       |             * CAST(tot.n_tot AS DOUBLE)), 6) AS tvd
       |  FROM cell
       |  JOIN grp ON grp.c_nationkey = cell.c_nationkey
       |          AND grp.band = cell.band
       |  JOIN gl ON gl.seg = cell.seg
       |  CROSS JOIN tot
       |  GROUP BY cell.c_nationkey, cell.band, grp.n_grp, tot.n_tot)
       |SELECT c_nationkey, band, n_grp, tvd,
       |       tvd <= CAST($t AS DOUBLE) AS pass
       |FROM tv ORDER BY c_nationkey, band""".stripMargin

  /** Twin of [[Privacy.entropyLDiversity]]: identical quantized
    * `c·ln(c)` cell terms (BIGINT at 1e6 scale — exact-integer group
    * sums in any order), identical final H/exp expression, identical
    * rounding-before-threshold. */
  def entropyLDiversity(width: Int, l: Double): String =
    s"""WITH cell AS (
       |  SELECT c_nationkey,
       |         CAST(floor(c_acctbal / $width) AS BIGINT) AS band,
       |         c_mktsegment AS seg, count(*) AS c
       |  FROM customer GROUP BY 1, 2, 3),
       |g AS (
       |  SELECT c_nationkey, band,
       |         CAST(sum(c) AS BIGINT) AS n_grp,
       |         count(*) AS l_distinct,
       |         CAST(sum(CAST(round(CAST(c AS DOUBLE)
       |                             * ln(CAST(c AS DOUBLE)) * 1e6)
       |                       AS BIGINT)) AS BIGINT) AS sq
       |  FROM cell GROUP BY 1, 2),
       |e AS (
       |  SELECT c_nationkey, band, n_grp, l_distinct,
       |         round(exp(ln(CAST(n_grp AS DOUBLE))
       |                   - CAST(sq AS DOUBLE)
       |                     / (CAST(n_grp AS DOUBLE) * 1e6)), 6)
       |           AS entropy_l
       |  FROM g)
       |SELECT c_nationkey, band, n_grp, l_distinct, entropy_l,
       |       entropy_l >= CAST($l AS DOUBLE) AS pass
       |FROM e ORDER BY c_nationkey, band""".stripMargin

  /** Twin of [[Privacy.dpVerify]]: the group count is the real oracle
    * value; the violation counters are definitionally zero for a correct
    * seeded release. */
  val dpVerify: String =
    """SELECT (SELECT count(DISTINCT c_mktsegment) FROM customer)
      |         AS n_groups,
      |       CAST(0 AS BIGINT) AS n_bound_violations,
      |       CAST(0 AS BIGINT) AS n_rederive_mismatch""".stripMargin
}
