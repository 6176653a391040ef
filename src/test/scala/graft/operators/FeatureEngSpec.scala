package graft.operators

import org.scalactic.Tolerance._

import graft.SparkSuite

/** Known-answer tests for the feature-engineering / data-audit lane:
  * m-estimate target encoding, basket association rules, Benford audit. */
class FeatureEngSpec extends SparkSuite {
  import spark.implicits._

  test("targetEncode: hand-computed shrinkage toward the global mean") {
    // A: y = 10, 20 (n=2); B: y = 30 (n=1); global mean μ = 20.
    val orders = Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 2L, 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, "A"), (2L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val r = FeatureEng.targetEncode(orders, customer, m = 10.0)
      .as[(String, Long, Double, Double)].collect().toSeq
    // enc_A = (30 + 10·20)/12 = 230/12; enc_B = (30 + 10·20)/11 = 230/11
    assert(r === Seq(
      ("A", 2L, 15.0, BigDecimal(230.0 / 12).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("B", 1L, 30.0, BigDecimal(230.0 / 11).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // shrinkage: every encoded value sits strictly between raw mean and μ
    r.foreach { case (_, _, raw, enc) =>
      assert((enc - raw).abs < (20.0 - raw).abs || raw == 20.0)
      assert((enc - 20.0).abs < (raw - 20.0).abs || raw == 20.0)
    }
  }

  test("targetEncode: m = 0 degenerates to the raw per-category mean") {
    val orders = Seq((1L, 1L, 10.0), (2L, 1L, 30.0), (3L, 2L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    FeatureEng.targetEncode(orders, customer, m = 0.0)
      .as[(String, Long, Double, Double)].collect()
      .foreach { case (_, _, raw, enc) => assert(enc === raw) }
  }

  test("cvTargetEncode: hand-computed out-of-fold cells at k = 2") {
    // folds by o_orderkey % 2; cells A0(n2,40) A1(n1,20) B0(n1,50) B1(n1,40)
    // μ_oof = 30 for both folds; m = 10
    val orders = Seq((0L, 1L, 10.0), (1L, 1L, 20.0), (2L, 1L, 30.0),
      (3L, 2L, 40.0), (4L, 2L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val r = FeatureEng.cvTargetEncode(orders, customer, k = 2, m = 10.0)
      .as[(String, Long, Long, Double)].collect().toSeq
    def enc(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq(
      ("A", 0L, 1L, enc(320.0 / 11)),
      ("A", 1L, 2L, enc(340.0 / 12)),
      ("B", 0L, 1L, enc(340.0 / 11)),
      ("B", 1L, 1L, enc(350.0 / 11))))
  }

  test("cvTargetEncode: a fold's encoding never sees its own targets") {
    val customer = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    def ordersWith(y0: Double) =
      Seq((0L, 1L, y0), (1L, 1L, 20.0), (2L, 1L, 30.0),
        (3L, 2L, 40.0), (4L, 2L, 50.0))
        .toDF("o_orderkey", "o_custkey", "o_totalprice")
    def fold0(y0: Double) =
      FeatureEng.cvTargetEncode(ordersWith(y0), customer, k = 2, m = 10.0)
        .where($"fold" === 0)
        .as[(String, Long, Long, Double)].collect().toSeq
    // order 0 sits in fold 0: perturbing its target must leave EVERY
    // fold-0 encoding (its own segment's and μ's alike) unchanged
    assert(fold0(10.0) === fold0(10000.0))
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets: o1 {1,2,3}, o2 {1,2}, o3 {2,3}, o4 {1}; a duplicate
    // (o2, part 1) line must NOT double-count (baskets are DISTINCT).
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L),
      (2L, 2L), (3L, 2L), (3L, 3L), (4L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val r = FeatureEng.associationRules(li, minSup = 2L)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(r === Seq(
      (1L, 2L, 2L, 0.5, 0.666667, 0.666667, 0.888889),
      (2L, 3L, 2L, 0.5, 0.666667, 1.0, 1.333333)))
  }

  test("psiDrift: hand-computed smoothed contributions on a 2-bin split") {
    // parity cohorts; bins by width 10: A = {5,5,15}, B = {5,15,15}
    // smoothed p(b0): A (2+1)/(3+2) = 0.6, B (1+1)/5 = 0.4
    // contrib(b0) = 0.2·ln(1.5); b1 mirrors it
    val orders = Seq((0L, 5.0), (2L, 5.0), (4L, 15.0),
      (1L, 5.0), (3L, 15.0), (5L, 15.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = FeatureEng.psiDrift(orders, nBins = 2, width = 10.0)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    val c = BigDecimal(0.2 * math.log(1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq((0, 2L, 1L, 0.6, 0.4, c), (1, 1L, 2L, 0.4, 0.6, c)))
  }

  test("psiDrift: identical cohorts contribute exactly zero per bin") {
    val orders = Seq((0L, 5.0), (1L, 5.0), (2L, 25.0), (3L, 25.0))
      .toDF("o_orderkey", "o_totalprice")
    FeatureEng.psiDrift(orders, nBins = 3, width = 10.0)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
      .foreach { row => assert(row._6 === 0.0, row) }
  }

  test("woeIv: hand-computed smoothed WOE on a 2-bin split") {
    // bin 0: 2 events, 1 non; bin 1: 1 event, 2 non (width 10)
    val orders = Seq((0L, 5.0, "F"), (1L, 5.0, "F"), (2L, 5.0, "O"),
      (3L, 15.0, "F"), (4L, 15.0, "O"), (5L, 15.0, "P"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val r = FeatureEng.woeIv(orders, nBins = 2, width = 10.0)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    // smoothed: bin0 p_evt (2+1)/5, p_non (1+1)/5; bin1 mirrored
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w0 = math.log((2.0 / 5) / (3.0 / 5))
    assert(r === Seq(
      (0, 2L, 1L, r6(w0), r6((2.0 / 5 - 3.0 / 5) * w0)),
      (1, 1L, 2L, r6(-w0), r6((3.0 / 5 - 2.0 / 5) * -w0))))
    // IV contributions are non-negative by construction
    r.foreach(row => assert(row._5 >= 0.0, row))
  }

  test("benford: exact digit extraction and inlined expectations") {
    // cents: 123, 5, 95000, 1999 → digits 1, 5, 9, 1; the 0.0 row drops
    val li = Seq(1.23, 0.05, 950.00, 19.99, 0.0).toDF("l_extendedprice")
    val r = FeatureEng.benford(li)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    def gap(freq: Double, d: Int) =
      BigDecimal((freq - FeatureEng.benfordExpected(d)).abs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq(
      (1, 2L, 0.5, FeatureEng.benfordExpected(1), gap(0.5, 1)),
      (5, 1L, 0.25, FeatureEng.benfordExpected(5), gap(0.25, 5)),
      (9, 1L, 0.25, FeatureEng.benfordExpected(9), gap(0.25, 9))))
  }

  test("benford: expectations sum to 1 and are log10(1 + 1/d)") {
    assert(FeatureEng.benfordExpected.values.sum === 1.000001 +- 1e-5)
    (1 to 9).foreach { d =>
      assert(FeatureEng.benfordExpected(d) ===
        math.log10(1.0 + 1.0 / d) +- 1e-6)
    }
  }

  // shared 2×2 contingency: A/F 2, A/O 1, B/F 1 (B/O never observed);
  // margins: A 3, B 1; F 3, O 1; N 4.
  private def contOrders = Seq(
    (1L, 1L, "F"), (2L, 1L, "F"), (3L, 1L, "O"), (4L, 2L, "F"))
    .toDF("o_orderkey", "o_custkey", "o_orderstatus")
  private def contCustomer = Seq((1L, "A"), (2L, "B"))
    .toDF("c_custkey", "c_mktsegment")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chiSquare: hand-computed expected counts and contributions") {
    val got = FeatureEng.chiSquare(contOrders, contCustomer)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // e(A,F)=3·3/4=2.25  e(A,O)=3·1/4=0.75  e(B,F)=1·3/4=0.75
    def chi(n: Long, e: Double) = r6((n - e) * (n - e) / e)
    assert(got === Seq(
      ("A", "F", 2L, 2.25, chi(2, 2.25)),
      ("A", "O", 1L, 0.75, chi(1, 0.75)),
      ("B", "F", 1L, 0.75, chi(1, 0.75))))
  }

  test("mutualInfo: hand-computed cell contributions; independence -> 0") {
    val got = FeatureEng.mutualInfo(contOrders, contCustomer)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    def mi(n: Double, rm: Double, cm: Double) = {
      val p = n / 4; val ind = (rm / 4) * (cm / 4)
      BigDecimal(p * math.log(p / ind))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === Map(
      ("A", "F") -> mi(2, 3, 3), ("A", "O") -> mi(1, 3, 1),
      ("B", "F") -> mi(1, 1, 3)))
    // an exactly independent 2×2 table has zero MI in every cell
    val indep = Seq(
      (1L, 1L, "F"), (2L, 1L, "O"), (3L, 2L, "F"), (4L, 2L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    FeatureEng.mutualInfo(indep, contCustomer).collect()
      .foreach(r => assert(r.getDouble(4) === 0.0))
  }

  test("cramersV: perfect association gives V = 1; independence gives 0") {
    // perfect: A<->F, B<->O (2x2, every row on the diagonal)
    val perfect = Seq((1L, 1L, "F"), (2L, 1L, "F"), (3L, 2L, "O"),
      (4L, 2L, "O")).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val p = FeatureEng.cramersV(perfect, contCustomer).collect().head
    assert(p.getLong(0) === 4L && p.getDouble(4) === 1.0)
    // independence: chi2 = 0 -> V = 0
    val indep = Seq((1L, 1L, "F"), (2L, 1L, "O"), (3L, 2L, "F"),
      (4L, 2L, "O")).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val i = FeatureEng.cramersV(indep, contCustomer).collect().head
    assert(i.getDouble(3) === 0.0 && i.getDouble(4) === 0.0)
  }

  test("corrMatrix: exact r = 1 / r = -1 on constructed columns") {
    // quantity ↑ with price (r=1), against discount (r=-1); tax constant
    // (zero variance -> NaN/null denominator -> excluded from checks)
    val li = Seq(
      (1.0, 10.00, 0.03, 0.05),
      (2.0, 20.00, 0.02, 0.05),
      (3.0, 30.00, 0.01, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = FeatureEng.corrMatrix(li).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("quantity", "extendedprice")) === Some(1.0))
    assert(got(("quantity", "discount")) === Some(-1.0))
    assert(got(("extendedprice", "discount")) === Some(-1.0))
    // constant column: zero variance -> NULL in both engines, never a
    // fabricated correlation (or an ANSI division error)
    assert(got(("quantity", "tax")) === None)
    assert(got(("extendedprice", "tax")) === None)
    assert(got(("discount", "tax")) === None)
    assert(got.size === 6)
    // n carried on every row
    assert(FeatureEng.corrMatrix(li).select("n").as[Long]
      .collect().forall(_ === 3L))
  }

  test("vif: hand-computed closed form (r_qp = r_qd = 0.8, r_pd = 0.4)") {
    // q = (1,2,3,4), p_cents = (1,2,4,3), d_cents = (1,3,2,4):
    // det(R) = 1 − .64 − .64 − .16 + 2·.256 = 0.072
    // R²_q = (0.64 + 0.64 − 2·0.8·0.8·0.4)/(1 − 0.16) = 0.914285714…,
    //   VIF_q = 0.84/0.072 = 11.666667
    // R²_p = R²_d = 0.288/0.36 = 0.8, VIF = 0.36/0.072 = 5.0
    val li = Seq(
      (1.0, 0.01, 0.01), (2.0, 0.02, 0.03),
      (3.0, 0.04, 0.02), (4.0, 0.03, 0.04))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val r = FeatureEng.vif(li)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r === Seq(
      ("discount", 4L, 0.8, 5.0),
      ("extendedprice", 4L, 0.8, 5.0),
      ("quantity", 4L, 0.914286, 11.666667)))
  }

  test("vif: a perfectly collinear pair makes R singular -> NULL vif; " +
      "the third variable's R2 on a degenerate pair is NULL too") {
    // q == p_cents exactly (r_qp = 1); d independent of both (r = 0)
    val li = Seq(
      (1.0, 0.01, 0.01), (2.0, 0.02, 0.01),
      (1.0, 0.01, 0.02), (2.0, 0.02, 0.02))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val rows = FeatureEng.vif(li).collect()
    rows.foreach(r => assert(r.isNullAt(3), s"vif must be NULL: $r"))
    val byFeat = rows.map(r => r.getString(0) -> r).toMap
    // regressing q on {p, d}: p reconstructs q exactly -> R2 = 1
    assert(byFeat("quantity").getDouble(2) === 1.0)
    assert(byFeat("extendedprice").getDouble(2) === 1.0)
    // regressing d on {q, p}: the predictor pair is itself collinear
    // (r_qp = 1 -> 1 − r_jk² = 0) -> R2 undefined
    assert(byFeat("discount").isNullAt(2))
  }

  test("pca2: perfectly correlated pair -> corr 1, evr1 1, ratio 0") {
    // x = (1,2,3,4), y_cents = (2,4,6,8): A = 4·30−100 = 20,
    // C = 4·120−400 = 80, B = 4·60−200 = 40; disc = √(60²+4·40²) = 100
    // λ1 = (100+100)/2 = 100, λ2 = 0; corr = 40/√1600 = 1
    val li = Seq((1.0, 0.02), (2.0, 0.04), (3.0, 0.06), (4.0, 0.08))
      .toDF("l_quantity", "l_extendedprice")
    val r = FeatureEng.pca2(li)
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((4L, 1.0, 1.0, 0.0)))
  }

  test("pca2: uncorrelated equal-variance pair -> corr 0, evr1 0.5, " +
      "ratio 1 (isotropic)") {
    // x = (1,2,1,2), y_cents = (1,1,2,2): A = C = 4, B = 36−36 = 0;
    // disc = 0 -> λ1 = λ2 = 4
    val li = Seq((1.0, 0.01), (2.0, 0.01), (1.0, 0.02), (2.0, 0.02))
      .toDF("l_quantity", "l_extendedprice")
    val r = FeatureEng.pca2(li)
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((4L, 0.0, 0.5, 1.0)))
  }

  test("pca2: a zero-variance feature -> corr NULL, the live feature " +
      "carries all variance (evr1 1)") {
    // x constant: A = 0 (corr undefined); C = 2·5−9 = 1, B = 0
    val li = Seq((1.0, 0.01), (1.0, 0.02))
      .toDF("l_quantity", "l_extendedprice")
    val row = FeatureEng.pca2(li).collect().head
    assert(row.getLong(0) === 2L)
    assert(row.isNullAt(1), s"corr must be NULL on zero variance: $row")
    assert(row.getDouble(2) === 1.0)
    assert(row.getDouble(3) === 0.0)
  }

  test("woeIvNtile: hand-computed two-tile split") {
    // prices 10 < 20 < 30 < 40 -> tile 1 = {10, 20} (both F),
    // tile 2 = {30, 40} (both O). Smoothed (n+1)/(tot+2):
    // bin 1: p_evt = 3/4, p_non = 1/4 -> woe = ln(1/3), iv = 0.549306
    val orders = Seq(
      (1L, 10.0, "F"), (2L, 20.0, "F"), (3L, 30.0, "O"), (4L, 40.0, "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val r = FeatureEng.woeIvNtile(orders, nBins = 2)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val woe1 = BigDecimal(math.log((1.0 / 4) / (3.0 / 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val iv = BigDecimal((1.0 / 4 - 3.0 / 4) * math.log((1.0 / 4) / (3.0 / 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === Seq((1L, 2L, 0L, woe1, iv), (2L, 0L, 2L, -woe1, iv)))
  }

  test("partialCorr: a pure confounder collapses the raw correlation " +
      "to ~0 once partialled out") {
    // quantity q drives both price p = 10q and discount d = q + noise
    // pattern: the raw p~d correlation is strong, but controlling for q
    // must remove it; reference values computed independently from the
    // exact sums in plain Scala
    // p tracks q closely but NOT exactly (r_qp ≈ 0.999, not 1 — an
    // exact affine p would zero the den guard instead)
    val rows = Seq(
      (1.0, 10.0, 0.01), (2.0, 20.5, 0.03), (3.0, 29.0, 0.02),
      (4.0, 41.0, 0.05), (5.0, 50.5, 0.04), (6.0, 59.0, 0.07))
    val df = rows.map { case (q, p, d) => (q, p, d) }
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    def corr(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxx = xs.map(x => x.toDouble * x).sum
      val syy = ys.map(y => y.toDouble * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x.toDouble * y }.sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val q = rows.map(r => math.round(r._1))
    val p = rows.map(r => math.round(r._2 * 100))
    val d = rows.map(r => math.round(r._3 * 100))
    val (rqp, rqd, rpd) = (corr(q, p), corr(q, d), corr(p, d))
    val expPartial = BigDecimal((rpd - rqp * rqd) /
      math.sqrt((1 - rqp * rqp) * (1 - rqd * rqd)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = FeatureEng.partialCorr(df)
      .as[(String, String, String, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val pd = got(("extendedprice", "discount"))
    assert(pd._3 === "quantity")
    assert(pd._5 > 0.8)            // raw correlation looks strong (0.895)
    assert(pd._6 === expPartial)   // exact agreement with the reference
    assert(math.abs(pd._6) < 0.5)  // ...and well under the raw value
  }

  test("partialCorr: a perfectly collinear control nulls the pair " +
      "(den <= 0 guard)") {
    // p = 10q exactly → r_qp = 1 → the (q, d | p) and (p, d | q) rows
    // survive, but any pair controlled by its own copy divides by zero
    val df = Seq((1.0, 10.0, 0.01), (2.0, 20.0, 0.05), (3.0, 30.0, 0.02))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val got = FeatureEng.partialCorr(df)
      .as[(String, String, String, Long, Option[Double], Option[Double])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // quantity~discount controlled by extendedprice: r_q,p = 1 → den 0
    assert(got(("quantity", "discount"))._6 === None)
    assert(got(("extendedprice", "discount"))._6 === None)
    // the collinear pair itself: r = 1 raw, den uses r with discount
    assert(got(("quantity", "extendedprice"))._5 === Some(1.0))
  }

  test("anova: hand-computed F and eta-squared on three balanced groups") {
    // cents (1000,2000 | 3000,4000 | 5000,6000): S_g = 3000/7000/11000,
    // B = 89.5e6, correction = 441e6/6 = 73.5e6 → SSB 16e6, SSW 1.5e6,
    // SST 17.5e6 → F = (16e6/4)/(1.5e6/1) = 2.666667, eta² = 0.914286
    val orders = Seq(
      (1L, 10.0, "1-URGENT"), (2L, 20.0, "1-URGENT"),
      (3L, 30.0, "2-HIGH"), (4L, 40.0, "2-HIGH"),
      (5L, 50.0, "3-MEDIUM"), (6L, 60.0, "3-MEDIUM"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val r = FeatureEng.anova(orders)
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(r === ((6L, Some(2.666667), Some(0.914286))))
  }

  test("anova: zero within-group variance nulls F; zero total variance " +
      "nulls both") {
    // distinct group means, identical values inside each group → SSW = 0
    val separated = Seq(
      (1L, 10.0, "1-URGENT"), (2L, 10.0, "1-URGENT"),
      (3L, 30.0, "2-HIGH"), (4L, 30.0, "2-HIGH"),
      (5L, 50.0, "3-MEDIUM"), (6L, 50.0, "3-MEDIUM"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val s = FeatureEng.anova(separated)
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(s._2 === None)         // F undefined at SSW = 0
    assert(s._3 === Some(1.0))    // all variance is between groups
    val flat = Seq(
      (1L, 10.0, "1-URGENT"), (2L, 10.0, "2-HIGH"), (3L, 10.0, "3-MEDIUM"),
      (4L, 10.0, "4-NOT SPECIFIED"), (5L, 10.0, "5-LOW"), (6L, 10.0, "5-LOW"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val f = FeatureEng.anova(flat)
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(f._2 === None && f._3 === None)
  }

  test("gini: a uniform distribution scores exactly 0") {
    // all equal x: 2·Σi·x = x·n(n+1) = (n+1)·Σx → numerator 0
    val orders = (1L to 8L).map(i => (i, 25.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = FeatureEng.gini(orders)
      .as[(Long, Double, Double)].collect().head
    assert(r._1 === 8L)
    assert(r._2 === 0.0)
  }

  test("gini: one holder of everything scores (n−1)/n; hand-computed " +
      "linear ramp hits 0.3 with an exact top-decile share") {
    // (0,0,0,100): G = (2·4·10000 − 5·10000)/(4·10000) = 0.75
    val concentrated = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0))
      .toDF("o_orderkey", "o_totalprice")
    val c = FeatureEng.gini(concentrated)
      .as[(Long, Double, Double)].collect().head
    assert(c === ((4L, 0.75, 0.0))) // n/10 = 0 → empty top decile
    // prices 1..10 dollars: Σx = 5500c, Σ rk·x = 100·385 = 38500c →
    // G = (77000 − 60500)/55000 = 0.3; top ⌊10/10⌋ = rank 10 alone →
    // 1000/5500 = 0.181818
    val ramp = (1L to 10L).map(i => (i, i.toDouble))
      .toDF("o_orderkey", "o_totalprice")
    val g = FeatureEng.gini(ramp).as[(Long, Double, Double)].collect().head
    assert(g === ((10L, 0.3, 0.181818)))
  }

  test("gini: ties in the amount leave the statistic invariant under " +
      "the key tie-break") {
    // equal x swap ranks freely: Σ rk·x is permutation-invariant, so
    // reversing the keys of tied rows must not move either output
    val a = Seq((1L, 5.0), (2L, 5.0), (3L, 90.0))
      .toDF("o_orderkey", "o_totalprice")
    val b = Seq((2L, 5.0), (1L, 5.0), (3L, 90.0))
      .toDF("o_orderkey", "o_totalprice")
    val ra = FeatureEng.gini(a).as[(Long, Double, Double)].collect().head
    val rb = FeatureEng.gini(b).as[(Long, Double, Double)].collect().head
    assert(ra === rb)
  }

  test("spearman: perfect monotone = 1, inverse = -1, constant = null") {
    def li(rows: (Long, Double, Double)*) =
      rows.map { case (k, q, p) => (k, 1L, q, p) }
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val up = FeatureEng.spearman(li(
      (1L, 1.0, 0.10), (2L, 2.0, 0.20), (3L, 3.0, 0.90), (4L, 4.0, 5.0)))
      .as[(Long, Option[Double])].collect().head
    assert(up === ((4L, Some(1.0))))
    val down = FeatureEng.spearman(li(
      (1L, 1.0, 5.0), (2L, 2.0, 0.90), (3L, 3.0, 0.20), (4L, 4.0, 0.10)))
      .as[(Long, Option[Double])].collect().head
    assert(down === ((4L, Some(-1.0))))
    val const = FeatureEng.spearman(li(
      (1L, 7.0, 0.10), (2L, 7.0, 0.20), (3L, 7.0, 0.30)))
      .as[(Long, Option[Double])].collect().head
    assert(const === ((3L, None)), "zero rank variance must null rho")
  }

  test("spearman: average-rank tie convention, hand-computed") {
    // x = [1,1,2] -> avg ranks [1.5, 1.5, 3] -> doubled [3,3,6];
    // y = [10,20,30]c -> doubled ranks [2,4,6]. Pearson over them:
    // num = 3*54 - 12*12 = 18; vx = 18, vy = 24 -> 18/sqrt(432)
    val d = Seq((1L, 1L, 1.0, 0.10), (2L, 1L, 1.0, 0.20),
      (3L, 1L, 2.0, 0.30))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val r = FeatureEng.spearman(d)
      .as[(Long, Option[Double])].collect().head
    assert(r === ((3L, Some(0.866025))))
  }

  test("xcorr: hand-computed lagged correlations over the zero-filled " +
      "hour grid") {
    val hour = 3600000000000L
    // a: [1,2,3] per hour; b: [3,2,1]; c present ONLY at h1 (count 2) —
    // the grid must fill its h0/h2 with real zeros
    val rows =
      Seq.fill(1)((0L, "a")) ++ Seq.fill(2)((hour, "a")) ++
        Seq.fill(3)((2 * hour, "a")) ++
      Seq.fill(3)((0L, "b")) ++ Seq.fill(2)((hour, "b")) ++
        Seq.fill(1)((2 * hour, "b")) ++
      Seq.fill(2)((hour, "c"))
    val ev = rows.toDF("ts", "event_type")
    val got = FeatureEng.xcorr(ev)
      .as[(String, String, Long, Long, Option[Double])].collect().toSet
    assert(got === Set(
      ("a", "b", 0L, 3L, Some(-1.0)), // [1,2,3] vs [3,2,1]
      ("a", "b", 1L, 2L, Some(-1.0)), // [1,2] vs [2,1]
      ("a", "b", 2L, 1L, None),       // single pair: zero variance
      ("a", "c", 0L, 3L, Some(0.0)),  // [1,2,3] vs [0,2,0]: num = 0
      ("a", "c", 1L, 2L, Some(-1.0)), // [1,2] vs [2,0]
      ("a", "c", 2L, 1L, None),
      ("b", "c", 0L, 3L, Some(0.0)),  // [3,2,1] vs [0,2,0]
      ("b", "c", 1L, 2L, Some(1.0)),  // [3,2] vs [2,0]
      ("b", "c", 2L, 1L, None)))
    spark.catalog.clearCache()
  }

  test("ksBinnedFace: hand-computed max CDF gap with tie-break") {
    val counts = Seq((0, 0, 3L), (0, 1, 1L), (1, 0, 1L), (1, 1, 3L))
      .toDF("cohort", "bin", "n")
    val r = FeatureEng.ksBinnedFace(counts)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // cum bin 0: |3/4 − 1/4| = 0.5; bin 1: |1 − 1| = 0 -> D at bin 0
    assert(r === Seq((4L, 4L, 0.5, 0)))
  }
}
