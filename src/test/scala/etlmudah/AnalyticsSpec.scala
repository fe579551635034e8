package etlmudah.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  private lazy val sales = {
    import spark.implicits._
    Seq(
      ("a", "x", 10.0, 1), ("a", "y", 20.0, 2), ("a", "y", 30.0, 3),
      ("b", "x", 40.0, 4), ("b", "x", 50.0, 5), ("c", "z", 60.0, 6)
    ).toDF("grp", "sub", "value", "id")
  }

  test("headlineMetrics: count/avg/median/min/max on a known frame") {
    val r = Analytics.headlineMetrics(sales, "value").collect().head
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("avg_value") == 35.0)
    assert(r.getAs[Double]("median_value") == 35.0)   // (30+40)/2
    assert(r.getAs[Double]("min_value") == 10.0)
    assert(r.getAs[Double]("max_value") == 60.0)
  }

  test("topKByCount: deterministic tie-break by key asc") {
    val r = Analytics.topKByCount(sales, "grp", 2).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))   // a=3, b=2
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 2L))
  }

  test("freqTable: count desc then key asc") {
    val r = Analytics.freqTable(sales, "sub").collect()
    assert(r.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 3L), ("y", 2L), ("z", 1L)))
  }

  test("histogram: floor binning with min/max per bin") {
    val r = Analytics.histogram(sales, col("value"), 25.0).collect()
    // bins: 10,20 -> 0; 30,40 -> 1; 50,60 -> 2
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L))
    assert(r.head.getAs[Double]("bin_min") == 10.0)
    assert(r.head.getAs[Double]("bin_lo") == 0.0)
  }

  test("histogram rightClosed: boundary values join the lower bin (pd.cut parity)") {
    import spark.implicits._
    val df = Seq(25.0, 50.0, 50.1, 0.0).toDF("v")
    val bins = Analytics.histogram(df, col("v"), 25.0, rightClosed = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (0,25] -> bin 0 gets {25.0, 0.0-floor}, (25,50] -> bin 1 gets {50.0},
    // (50,75] -> bin 2 gets {50.1}
    assert(bins == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("shareOfTotal: shares sum to 100") {
    val shares = Analytics.shareOfTotal(sales, "grp").collect()
      .map(_.getAs[Double]("share_pct"))
    assert(math.abs(shares.sum - 100.0) < 1e-6)
  }

  test("skyline2d: matches the quadratic dominance definition, duplicates survive") {
    import spark.implicits._
    val pts = Seq(
      (1, 10, 5.0), (2, 10, 5.0),   // exact duplicates -> both survive
      (3, 12, 7.0), (4, 8, 4.0), (5, 12, 6.0), (6, 5, 1.0),
      (7, 12, 9.0), (8, 9, 4.5), (9, 3, 1.0), (10, 3, 0.5),
      (11, 12, 6.0)                  // duplicate of the frontier corner
    )
    // brute-force definition: no other point with sz >= && price <=
    // and strict in at least one
    val expected = pts.filter { case (_, s, p) =>
      !pts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p)
      }
    }.map(_._1).toSet
    for (buckets <- Seq(1, 3, 64)) {
      val got = Analytics.skyline2d(pts.toDF("id", "sz", "price"),
        "sz", "price", buckets = buckets)
        .select("id").as[Int].collect().toSet
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("skyline2d: null axes drop; empty input yields empty frontier") {
    import spark.implicits._
    val df = Seq[(Int, Option[Int], Option[Double])](
      (1, Some(5), None), (2, None, Some(1.0)), (3, Some(4), Some(2.0)))
      .toDF("id", "sz", "price")
    val got = Analytics.skyline2d(df, "sz", "price")
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(3))
    val empty = Analytics.skyline2d(
      df.where(col("id") > 99), "sz", "price")
    assert(empty.count() == 0)
  }

  test("activityIslands: consecutive-month runs collapse; distribution grain") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // A: [Jan,Feb,Mar] [Jun,Jul] [Oct]; B: [Apr]; Feb duplicated
    val df = Seq(
      ("A", ts("2024-01-15")), ("A", ts("2024-02-01")),
      ("A", ts("2024-02-20")), ("A", ts("2024-03-31")),
      ("A", ts("2024-06-01")), ("A", ts("2024-07-01")),
      ("A", ts("2024-10-01")), ("B", ts("2024-04-10"))
    ).toDF("k", "t")
    val r = Analytics.activityIslands(df, "k", "t").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 2L, 2L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("activityIslands: December->January runs bridge the year boundary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val df = Seq(("A", ts("2023-12-01")), ("A", ts("2024-01-05")))
      .toDF("k", "t")
    val r = Analytics.activityIslands(df, "k", "t").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("welchTTest: matches the closed form; lattice-exact moments") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0))
      .toDF("g", "v")
    val r = Analytics.welchTTest(df, "v", "g", "a", "b").collect().head
    val (ma, mb) = (2.0, 5.0)
    val (va, vb) = (1.0, 20.0 / 3.0)   // sample variances
    val se2 = va / 3 + vb / 4
    val t = (ma - mb) / math.sqrt(se2)
    val dfw = se2 * se2 /
      (va * va / (3.0 * 3 * 2) + vb * vb / (4.0 * 4 * 3))
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("df_welch") - dfw) < 1e-4)
  }

  test("welchTTest: degenerate inputs yield null t, not a crash") {
    import spark.implicits._
    // n_a = 1
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r1 = Analytics.welchTTest(tiny, "v", "g", "a", "b").collect().head
    assert(r1.isNullAt(r1.fieldIndex("t_stat")))
    // zero pooled variance (both groups constant)
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val r2 = Analytics.welchTTest(const, "v", "g", "a", "b").collect().head
    assert(r2.isNullAt(r2.fieldIndex("t_stat")) &&
      r2.isNullAt(r2.fieldIndex("df_welch")))
    // one group entirely absent
    val r3 = Analytics.welchTTest(tiny, "v", "g", "a", "zzz")
      .collect().head
    assert(r3.getAs[Long]("n_b") == 0 &&
      r3.isNullAt(r3.fieldIndex("t_stat")))
  }

  test("theilSenBy: median pairwise slope + MK S replay; spike-robust") {
    import spark.implicits._
    // y = 3x except one spike; OLS would tilt, Theil-Sen must not
    val pts = Seq((1L, 3L), (2L, 6L), (3L, 9L), (4L, 1000L), (5L, 15L))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val slopes = (for {
      (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
    } yield (y2 - y1).toDouble / (x2 - x1)).sorted
    val expMed = (slopes(4) + slopes(5)) / 2   // 10 pairs, interpolated
    val expS = (for {
      (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
    } yield math.signum((y2 - y1).toDouble).toLong).sum
    val r = Analytics.theilSenBy(df, "x", "y", Seq("g")).collect().head
    assert(r.getAs[Long]("n_points") == 5 && r.getAs[Long]("n_pairs") == 10)
    assert(r.getAs[Long]("mk_s") == expS)
    assert(math.abs(r.getAs[Double]("slope_med") - expMed) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_med") - 3.0) < 1.0,
      "median slope must shrug off the spike")
    // the cap binds deterministically
    val capped = Analytics.theilSenBy(df, "x", "y", Seq("g"), maxN = 3)
      .collect().head
    assert(capped.getAs[Long]("n_points") == 3 &&
      capped.getAs[Long]("n_pairs") == 3)
  }

  test("theilSenBy: in-stage pair generation equals the self-join formulation; " +
       "pairless groups vanish") {
    import spark.implicits._
    // multi-group lattice series incl. a singleton group (no pair) and
    // an all-equal-x group (pairs filtered): both must yield NO row,
    // exactly as the old inner self-join dropped them
    val rows =
      (1L to 40L).map(i => ("a", i % 7, (i * 31) % 23)) ++
      (1L to 25L).map(i => ("b", i % 5, (i * 17) % 11)) ++
      Seq(("solo", 1L, 5L)) ++
      Seq(("flatx", 2L, 1L), ("flatx", 2L, 9L), ("flatx", 2L, 4L))
    val df = rows.toDF("g", "x", "y")
    val got = Analytics.theilSenBy(df, "x", "y", Seq("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got.map(_._1) == Seq("a", "b"), got.toString)
    // the old formulation, inlined: group-keyed self-join + count join
    val capped = df.select(col("g"), col("x").cast("long").as("__x"),
      col("y").cast("long").as("__y"))
    val a = capped.select(col("g"), col("__x").as("__x1"),
      col("__y").as("__y1"))
    val b = capped.select(col("g"), col("__x").as("__x2"),
      col("__y").as("__y2"))
    val pairs = a.join(b, Seq("g")).where(col("__x1") < col("__x2"))
      .withColumn("__slope", (col("__y2") - col("__y1")).cast("double") /
        (col("__x2") - col("__x1")).cast("double"))
      .withColumn("__sgn",
        signum((col("__y2") - col("__y1")).cast("double")).cast("long"))
    val old = pairs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__sgn")).as("mk_s"),
        round(median(col("__slope")), 6).as("slope_med"))
      .join(capped.groupBy(col("g")).agg(count(lit(1)).as("n_points")),
        Seq("g"))
      .select(col("g"), col("n_points"), col("n_pairs"), col("mk_s"),
        col("slope_med"))
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == old, s"got=$got old=$old")
  }

  test("ksTest: exact D on the lattice; identical samples give D=0") {
    import spark.implicits._
    val a = Seq(1.0, 1.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val r = Analytics.ksTest(a, b, "v").collect().head
    // ECDFs over lattice {1,2,3}: A = 2/3, 3/3, 3/3; B = 0, 1/2, 1
    // |diff| = 2/3, 1/2, 0 -> D = 2/3 at v=1
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("d_stat") == 0.666667)
    assert(r.getAs[Long]("d_at") == 1L)
    val same = Analytics.ksTest(a, a, "v").collect().head
    assert(same.getAs[Double]("d_stat") == 0.0)
  }

  test("chiSquareIndependence: zero under independence, n under perfect association") {
    import spark.implicits._
    val indep = Seq.tabulate(20)(i =>
      (if (i % 2 == 0) "a1" else "a2", if (i % 4 < 2) "b1" else "b2"))
      .toDF("a", "b")
    val r1 = Analytics.chiSquareIndependence(indep, "a", "b").collect().head
    assert(r1.getAs[Double]("chi2") == 0.0)
    assert(r1.getAs[Double]("cramers_v") == 0.0)
    assert(r1.getAs[Long]("dof") == 1L)
    val assoc = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2")))
      .toDF("a", "b")
    val r2 = Analytics.chiSquareIndependence(assoc, "a", "b").collect().head
    assert(r2.getAs[Double]("chi2") == 10.0)   // chi2 = n at V=1
    assert(r2.getAs[Double]("cramers_v") == 1.0)
    // single-level column -> dof 0, null V
    val flat = Seq(("a1", "b1"), ("a1", "b2")).toDF("a", "b")
    val r3 = Analytics.chiSquareIndependence(flat, "a", "b").collect().head
    assert(r3.getAs[Long]("dof") == 0L &&
      r3.isNullAt(r3.fieldIndex("cramers_v")))
  }

  test("weightedQuantilesBy: lower weighted quantile on hand weights; diverges from row grain") {
    import spark.implicits._
    // g: values 1..4, weights 1,1,1,7 (value 4 arrives as two rows
    // that must collapse) -> total 10; cw = 1,2,3,10
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 3L), ("g", 4L, 4L),
      ("h", 5L, 2L), ("h", 6L, 0L)   // zero weight drops
    ).toDF("grp", "v", "w")
    val r = Analytics.weightedQuantilesBy(df, "v", "w", Seq("grp"),
      qs = Seq(0.25, 0.5, 0.9)).collect()
      .map(x => x.getString(0) -> x).toMap
    val g = r("g")
    assert(g.getAs[Long]("total_w") == 10L)
    assert(g.getAs[Long]("wq_25") == 3L)   // cw 2 < 2.5 -> first v is 3
    assert(g.getAs[Long]("wq_50") == 4L)   // the weighted median
    assert(g.getAs[Long]("wq_90") == 4L)
    val h = r("h")
    assert(h.getAs[Long]("total_w") == 2L &&
      h.getAs[Long]("wq_50") == 5L)
  }

  test("cusumChangepoint: level shift located; zero-total yields null stat") {
    import spark.implicits._
    val df = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L),
      ("g", 4L, 10L), ("g", 5L, 10L),
      ("z", 1L, 5L), ("z", 2L, -5L)).toDF("g", "t", "y")
    val r = Analytics.cusumChangepoint(df, "t", "y", Seq("g")).collect()
      .map(x => x.getString(0) -> x).toMap
    // g: S=[0,0,0,10,20], n=5, T=20 -> dev=[20,40,60,30,0], max at t=3
    assert(r("g").getAs[Long]("t_star") == 3L)
    assert(r("g").getAs[Double]("d_stat") == 0.6)
    assert(r("z").isNullAt(r("z").fieldIndex("d_stat")))
  }

  test("latestPerKey: deterministic winner under duplicate keys") {
    import spark.implicits._
    val dup = Seq(("k1", 1, "old"), ("k1", 2, "new"), ("k2", 5, "only"))
      .toDF("k", "ver", "payload")
    val r = Analytics.latestPerKey(dup, Seq("k"), Seq(col("ver").desc))
      .orderBy("k").collect()
    assert(r.map(_.getString(2)).toSeq == Seq("new", "only"))
  }

  test("quartilesBy: interpolating percentiles on known values") {
    import spark.implicits._
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("k", "v")
    val r = Analytics.quartilesBy(df, "k", col("v")).collect().head
    assert(r.getAs[Double]("q1") == 1.75)
    assert(r.getAs[Double]("q2") == 2.5)
    assert(r.getAs[Double]("q3") == 3.25)
  }

  test("topNPerGroup: rank within group with explicit ordering") {
    val r = Analytics.topNPerGroup(sales, Seq("grp"),
      Seq(col("value").desc, col("id").asc), 1)
    assert(r.filter(col("grp") === "a").collect().head.getAs[Double]("value") == 30.0)
    assert(r.count() == 3)
  }

  test("approx_count_distinct within 5% of exact on the testdata") {
    val li = etlmudah.Tables.lineitem(spark, sf0001)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("statsByApprox: approx median within 1% of exact per group") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val exact = Analytics.statsBy(orders, col("o_orderstatus"), "k",
        col("o_totalprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val approx = Analytics.statsByApprox(orders, col("o_orderstatus"), "k",
        col("o_totalprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, m) =>
      assert(math.abs(approx(k) - m) / m < 0.01,
        s"group $k: exact=$m approx=${approx(k)}")
    }
  }

  test("topKByCountApprox == exact topKByCount while cardinality fits the sketch") {
    val li = etlmudah.Tables.lineitem(spark, sf0001)
    for (key <- Seq("l_returnflag", "l_partkey")) {
      val exact = Analytics.topKByCount(li, key, 10).collect()
        .map(r => r.get(0) -> r.getLong(1))
      val approx = Analytics.topKByCountApprox(li, key, 10).collect()
        .map(r => r.get(0) -> r.getLong(1))
      // counts identical (sketch is exact below maxItemsTracked); item
      // order identical thanks to the deterministic re-sort
      assert(approx.toSeq == exact.toSeq, s"key=$key")
    }
  }

  test("cardinalityRollup: per-group and merged estimates within 5% of exact") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val est = Analytics.cardinalityRollup(orders, "o_orderstatus", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactGroups = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactTotal = orders.select(countDistinct(col("o_custkey")))
      .collect().head.getLong(0)
    exactGroups.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05, s"$k: est=${est(k)} exact=$n")
    }
    // the union row must track the TRUE distinct total (not the sum of
    // groups, which double-counts customers active in several statuses)
    assert(math.abs(est("__total__") - exactTotal).toDouble / exactTotal < 0.05)
    assert(exactGroups.values.sum > exactTotal, "overlap exists; sums would be wrong")
  }

  test("distinctDomain: sorted unique values") {
    val r = Analytics.distinctDomain(sales, "sub").collect().map(_.getString(0))
    assert(r.toSeq == Seq("x", "y", "z"))
  }

  test("cubeCounts: every grouping-set level present, indicators disambiguate") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val rows = Analytics.cubeCounts(orders, "o_orderpriority",
      "o_orderstatus", col("o_totalprice")).collect()
    val total = orders.count()
    // exactly one grand-total row, carrying the full count
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1 && grand.head.getLong(4) == total)
    // per-level counts each re-sum to the grand total
    Seq((0L, 0L), (0L, 1L), (1L, 0L)).foreach { case (ga, gb) =>
      val level = rows.filter(r => r.getLong(2) == ga && r.getLong(3) == gb)
      assert(level.map(_.getLong(4)).sum == total, s"level ($ga,$gb)")
    }
    // indicator == 1 iff the key column is rolled up (NULL from Expand)
    rows.foreach { r =>
      assert((r.getLong(2) == 1) == r.isNullAt(0), r.toString)
      assert((r.getLong(3) == 1) == r.isNullAt(1), r.toString)
    }
  }

  test("quantileBuckets: partition of the input, near-equal counts, t-digest dial agrees") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val n = orders.count()
    def check(exact: Boolean): Map[Long, Long] = {
      val rows = Analytics.quantileBuckets(orders, col("o_totalprice"),
          buckets = 10, exact = exact)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.keySet == (1L to 10L).toSet, rows.keySet.toString)
      assert(rows.values.sum == n)          // every row lands in one bucket
      // half-open percentile buckets: counts near n/10, not exactly
      rows.values.foreach(c => assert(c > n / 20 && c < n / 5, rows.toString))
      rows
    }
    val ex = check(exact = true)
    val ap = check(exact = false)
    // at this size the t-digest is near-lossless: bucket counts track the
    // exact tier within 2% of n
    ex.foreach { case (b, c) =>
      assert(math.abs(ap(b) - c) <= n / 50, s"bucket $b: $c vs ${ap(b)}")
    }
  }

  test("robustOutliers: flags the planted whale, not the tight cluster") {
    import spark.implicits._
    val df = (Seq.tabulate(20)(i => ("a", 10.0 + i % 5)) :+ (("a", 1000.0)))
      .++(Seq.tabulate(21)(i => ("b", 50.0 + i % 3)))
      .toDF("k", "v")
    val rows = Analytics.robustOutliers(df, "k", col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    val (na, medA, outA) = rows("a")
    val (nb, _, outB) = rows("b")
    assert(na == 21 && nb == 21)
    assert(medA == 12.0, s"median $medA")
    assert(outA == 1, s"whale not flagged: $outA")  // only the 1000.0
    assert(outB == 0, s"false positives in tight group: $outB")
  }

  test("chiSquare: independent table contributes ~0, dependent table > 0") {
    import spark.implicits._
    // perfectly independent 2x2: obs == expected in every cell
    val indep = (Seq.fill(40)(("x", "p")) ++ Seq.fill(40)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val ci = Analytics.chiSquare(indep, "a", "b").collect()
    assert(ci.length == 4)
    ci.foreach(r => assert(r.getDouble(4) == 0.0, r.toString))
    assert(ci.map(_.getLong(2)).sum == 100)
    // fully dependent: diagonal only -> large contributions
    val dep = (Seq.fill(50)(("x", "p")) ++ Seq.fill(50)(("y", "q"))).toDF("a", "b")
    val cd = Analytics.chiSquare(dep, "a", "b").collect()
    assert(cd.forall(_.getDouble(4) > 0.0))
  }

  test("quantileCalibration: t-digest boundaries inside a 1% envelope") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val out = Analytics.quantileCalibration(orders, col("o_totalprice"), 10)
      .collect()
    assert(out.length == 9)
    assert(out.forall(_.getDouble(4) <= 0.01),
      out.map(_.getDouble(4)).mkString(","))
    // boundaries are monotone in q
    val ex = out.map(_.getDouble(2))
    assert(ex.zip(ex.tail).forall { case (a, b) => a <= b })
  }

  test("interEventGaps: hand log with exact gap stats, ties broken by id") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: events at 0s, 10s, 40s -> gaps 10 (click), 30 (buy)
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 00:00:10"), "click"),
      (3L, 1L, ts("2024-01-01 00:00:40"), "buy"),
      // user 2: simultaneous pair — id order makes the gap exactly 0
      (4L, 2L, ts("2024-01-01 00:01:00"), "view"),
      (5L, 2L, ts("2024-01-01 00:01:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Analytics.interEventGaps(events, "ts", "user_id",
        "event_type", "event_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out("click") == ((2L, 5.0, 5.0)))   // gaps 10 and 0
    assert(out("buy") == ((1L, 30.0, 30.0)))
    assert(!out.contains("view"))              // first events have no gap
  }

  test("proportionCI: Wilson interval matches the closed form, brackets the rate") {
    import spark.implicits._
    val df = (Seq.fill(90)(("g", 1)) ++ Seq.fill(10)(("g", 0)))
      .toDF("k", "ok")
    val r = Analytics.proportionCI(df, "k", col("ok") === 1).collect().head
    assert(r.getLong(1) == 100L && r.getLong(2) == 90L)
    assert(r.getDouble(3) == 90.0)
    val (n, p, z) = (100.0, 0.9, 1.96)
    val denom = 1.0 + z * z / n
    val center = p + z * z / (2 * n)
    val spread = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(r.getDouble(4) == r4((center - spread) / denom * 100.0))
    assert(r.getDouble(5) == r4((center + spread) / denom * 100.0))
    // the interval brackets the point rate and stays inside [0, 100]
    assert(r.getDouble(4) > 80.0 && r.getDouble(4) < 90.0)
    assert(r.getDouble(5) > 90.0 && r.getDouble(5) < 100.0)
  }

  test("anomalyZ: flags a planted spike, skips partial baselines") {
    import spark.implicits._
    import java.sql.Timestamp
    // 30 hours of steady traffic (alternating 4/6 events/hour so the
    // baseline variance is nonzero), with hour 28 spiked to 40
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 28) 40 else if (h % 2 == 0) 4 else 6
      (0 until n).map(i =>
        (Timestamp.valueOf(f"2024-01-01 ${h % 24}%02d:15:00").toInstant
          .plusSeconds(h / 24 * 86400L + i), "load"))
    }.map { case (t, k) => (Timestamp.from(t), k) }.toDF("ts", "key")
    val out = Analytics.anomalyZ(rows, "ts", "key", lookback = 24)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    // first scored hour is hour 24 (full window); 6 scored hours total
    assert(out.length == 6, s"scored ${out.length}")
    val zByCnt = out.map(r => (r._2, r._3)).toMap
    assert(zByCnt(40L) > 10.0, s"spike z ${zByCnt(40L)}")   // the whale
    assert(out.filter(_._2 != 40L).forall(r => math.abs(r._3) < 2.0))
  }

  test("anomalyZ: an OUTAGE hour (zero events) is densified in and scored") {
    import spark.implicits._
    import java.sql.Timestamp
    // steady 4/6 alternation for 30 hours, except hour 28 has NO events
    // at all — without densification that hour produces no row, is never
    // scored, and silently stretches every later baseline past 24h
    val rows = (0 until 30).filter(_ != 28).flatMap { h =>
      val n = if (h % 2 == 0) 4 else 6
      (0 until n).map(i =>
        (Timestamp.valueOf(f"2024-01-01 ${h % 24}%02d:15:00").toInstant
          .plusSeconds(h / 24 * 86400L + i), "load"))
    }.map { case (t, k) => (Timestamp.from(t), k) }.toDF("ts", "key")
    val out = Analytics.anomalyZ(rows, "ts", "key", lookback = 24)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    // hours 24..29 all carry full 24-bucket baselines — INCLUDING the
    // zero-count outage hour, which must be present and strongly negative
    assert(out.length == 6, s"scored ${out.length}")
    val outage = out.filter(_._2 == 0L)
    assert(outage.length == 1, out.mkString(","))
    assert(outage.head._3 < -3.0, s"outage z ${outage.head._3}")
  }

  test("calibrationTable: deterministic bins, hand-computed rates, tie split by id") {
    import spark.implicits._
    // 6 docs, bins=3 -> 2 per bin in (score, id) order; the two 0.5
    // scores split deterministically by id
    val rows = Seq(
      (1L, 0.1, 0), (2L, 0.2, 0),
      (3L, 0.5, 1), (4L, 0.5, 0),
      (5L, 0.8, 1), (6L, 0.9, 1))
      .toDF("id", "score", "y")
    val out = Analytics.calibrationTable(rows, "score", "y", "id", bins = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // order: 0.1(1) 0.2(2) | 0.5(3) 0.5(4) | 0.8(5) 0.9(6)
    assert(out.toSeq == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 1L, 0.5),
      (3L, 2L, 2L, 1.0)), out.mkString(","))
    // determinism across runs
    val again = Analytics.calibrationTable(rows, "score", "y", "id", bins = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("binaryAuc: textbook values, average-rank ties, degenerate single class") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Int)]): Option[Double] = {
      val r = Analytics.binaryAuc(rows.toDF("score", "y"), "score", "y")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    // perfect separation
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))).contains(1.0))
    // perfect inversion
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))).contains(0.0))
    // hand computation: scores 0.1(y0) 0.4(y1) 0.35(y0) 0.8(y1) ->
    // one discordant-free? pairs: (0.4>0.1 ok)(0.4>0.35 ok)(0.8>..)
    // pos scores {0.4, 0.8}, neg {0.1, 0.35}: all 4 pairs concordant
    assert(auc(Seq((0.1, 0), (0.4, 1), (0.35, 0), (0.8, 1))).contains(1.0))
    // one discordant pair of four: AUC = 3/4
    assert(auc(Seq((0.1, 0), (0.4, 1), (0.5, 0), (0.8, 1))).contains(0.75))
    // TIES take half credit: pos and neg share score 0.5 ->
    // pairs: (0.5 vs 0.1)=1, (0.5 vs 0.5)=0.5 -> AUC = 0.75
    assert(auc(Seq((0.1, 0), (0.5, 0), (0.5, 1), (0.9, 0))).contains(0.5))
    // recompute that one by hand: pos={0.5}, neg={0.1,0.5,0.9}:
    // vs 0.1 -> 1, vs 0.5 -> 0.5, vs 0.9 -> 0 => (1+0.5+0)/3 = 0.5
    // all-one-class inputs yield null, not a crash
    assert(auc(Seq((0.3, 1), (0.7, 1))).isEmpty)
    assert(auc(Seq((0.3, 0), (0.7, 0))).isEmpty)
  }

  test("benfordReport: exact digit extraction, sub-1 and null excluded, chi terms replay") {
    import spark.implicits._
    val vals = Seq(Some(1.5), Some(12.0), Some(19.9), Some(2.3),
      Some(95.0), Some(0.5), None, Some(-30.0))
    val rows = Analytics.benfordReport(vals.toDF("v"), "v").collect()
    val byDigit = rows.map(r => r.getInt(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // 0.5 (sub-1) and null excluded; -30 counts under |v| digit 3
    assert(byDigit.keySet == Set(1, 2, 3, 9))
    assert(byDigit(1)._1 == 3L && byDigit(2)._1 == 1L &&
      byDigit(3)._1 == 1L && byDigit(9)._1 == 1L)
    def r6(d: Double) = BigDecimal.valueOf(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDigit(1)._2 == 0.5 && byDigit(1)._3 == 0.301030)
    val e1 = 6.0 * 0.301030
    assert(byDigit(1)._4 == r6((3.0 - e1) * (3.0 - e1) / e1))
    // digits come out ordered
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 9))
  }

  test("jackknifeMeanByGroup: serial replay on hand groups; degenerate single group is safe") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 30.0), ("b", 50.0),
      ("c", 40.0)).toDF("g", "v")
    val r = Analytics.jackknifeMeanByGroup(df, "v", "g").collect()(0)
    // serial replay of the documented chain
    val cents = Map("a" -> Seq(1000L, 2000L), "b" -> Seq(3000L, 5000L),
      "c" -> Seq(4000L))
    val (bigN, bigS) = (5L, cents.values.flatten.sum)
    val ts = cents.values.map { s =>
      val theta = (bigS - s.sum).toDouble / (100.0 * (bigN - s.size))
      BigDecimal.valueOf(theta * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
    }.toSeq
    val g = ts.size.toLong
    val varNum = (BigInt(g) * ts.map(t => BigInt(t) * BigInt(t)).sum -
      BigInt(ts.sum) * BigInt(ts.sum)).toDouble
    def r6(d: Double) = BigDecimal.valueOf(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6(bigS.toDouble / (100.0 * 5)))
    assert(r.getDouble(3) ==
      r6(math.sqrt(varNum * (g - 1).toDouble) / g.toDouble / 10000.0))
    assert(r.getDouble(3) > 0.0)
    // one group: se collapses to 0, no Infinity cast crash
    val one = Analytics.jackknifeMeanByGroup(
      Seq(("x", 7.0), ("x", 9.0)).toDF("g", "v"), "v", "g").collect()(0)
    assert(one.getDouble(3) == 0.0 && one.getDouble(2) == 8.0)
  }

  test("linearFit: closed form on hand data; perfect line gives r2 = 1; null rows excluded") {
    import spark.implicits._
    // y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    val perfect = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0))
      .toDF("x", "y")
    val p = Analytics.linearFit(perfect, "x", "y").collect()(0)
    assert(p.getLong(0) == 4L)
    assert(p.getDouble(1) == 2.0 && p.getDouble(2) == 1.0 &&
      p.getDouble(3) == 1.0)
    // hand-checked noisy fit: (0,1),(1,2),(2,2),(3,4) ->
    // n=4 Sx=6 Sy=9 Sxx=14 Sxy=18 Syy=25
    // slope = (4*18-6*9)/(4*14-36) = 18/20 = 0.9
    // intercept = (9*14 - 6*18)/20 = 18/20 = 0.9
    // r2 = 18^2/(20*(4*25-81)) = 324/380
    val noisy = Seq((0.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 4.0))
      .toDF("x", "y")
    val r = Analytics.linearFit(noisy, "x", "y").collect()(0)
    def r6(d: Double) = BigDecimal.valueOf(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(1) == 0.9 && r.getDouble(2) == 0.9)
    assert(r.getDouble(3) == r6(324.0 / 380.0))
    // null coordinates are excluded, not zero-treated
    val withNulls = Seq((Some(1.0), Some(3.0)), (Some(2.0), Some(5.0)),
      (None, Some(99.0)), (Some(99.0), None),
      (Some(3.0), Some(7.0)), (Some(4.0), Some(9.0))).toDF("x", "y")
    val w = Analytics.linearFit(withNulls, "x", "y").collect()(0)
    assert(w.getLong(0) == 4L && w.getDouble(1) == 2.0)
  }

  test("spearmanBy: monotone = 1, reversed = -1, hand Σd², n<2 null, nulls drop") {
    import spark.implicits._
    val df = Seq(
      // g1: y strictly increasing with x -> rho 1 (any nonlinearity ok)
      ("g1", 1.0, 10.0, 1L), ("g1", 2.0, 100.0, 2L),
      ("g1", 3.0, 101.0, 3L), ("g1", 4.0, 5000.0, 4L),
      // g2: perfectly reversed -> rho -1
      ("g2", 1.0, 9.0, 5L), ("g2", 2.0, 8.0, 6L), ("g2", 3.0, 7.0, 7L),
      // g3: ranks x=(1,2,3), y=(2,1,3) -> d2 = 1+1+0 = 2,
      // rho = 1 - 12/24 = 0.5
      ("g3", 1.0, 5.0, 8L), ("g3", 2.0, 4.0, 9L), ("g3", 3.0, 6.0, 10L),
      // g4: single row -> null rho
      ("g4", 1.0, 1.0, 11L)
    ).toDF("k", "x", "y", "id")
    val got = Analytics.spearmanBy(df, "k", col("x"), col("y"), col("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("g1") == ((4L, 0L, Some(1.0))))
    assert(got("g2") == ((3L, 8L, Some(-1.0))))
    assert(got("g3") == ((3L, 2L, Some(0.5))))
    assert(got("g4") == ((1L, 0L, None)))
    // null measures drop before ranking
    val withNull = Seq(("g", Some(1.0), Some(1.0), 1L),
      ("g", None, Some(2.0), 2L), ("g", Some(2.0), Some(3.0), 3L))
      .toDF("k", "x", "y", "id")
    val n = Analytics.spearmanBy(withNull, "k", col("x"), col("y"),
      col("id")).collect()(0)
    assert(n.getLong(1) == 2L && n.getDouble(3) == 1.0)
    // rows duplicated on EVERY attribute stay deterministic: ry's
    // tie-break is rx itself, so the duplicate pair aligns (d = 0)
    // at any partitioning instead of pairing arbitrarily
    val dup = Seq(("g", 1.0, 9.0, 1L), ("g", 1.0, 9.0, 1L),
      ("g", 2.0, 3.0, 2L))
    Seq(1, 4).foreach { parts =>
      val r = Analytics.spearmanBy(dup.toDF("k", "x", "y", "id")
          .repartition(parts), "k", col("x"), col("y"), col("id"))
        .collect()(0)
      // rx=(1,2,3), y-order: 3 first -> ry=(2,3,1); d2 = 1+1+4 = 6
      assert(r.getLong(2) == 6L, s"parts=$parts: ${r.getLong(2)}")
    }
  }

  test("modeBy: frequency argmax, ties to the smallest value, nulls out") {
    import spark.implicits._
    val df = Seq(("g", Some(3.0)), ("g", Some(3.0)), ("g", Some(1.0)),
      ("g", Some(1.0)), ("g", Some(2.0)), ("g", None),
      ("h", Some(9.0))).toDF("k", "v")
    val got = Analytics.modeBy(df, "k", col("v")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // g: 1.0 and 3.0 both appear twice -> tie to the smaller (1.0)
    assert(got == Map("g" -> ((1.0, 2L)), "h" -> ((9.0, 1L))))
  }

  test("targetEncodeBy: small categories shrink toward the global mean") {
    import spark.implicits._
    // global mean = 55; big category (n=100, mean 10) barely moves,
    // tiny category (n=1, mean 100) shrinks hard
    val rows = (1 to 100).map(_ => ("big", 10.0)) :+ (("tiny", 100.0))
    val df = rows.toDF("k", "t")
    val got = Analytics.targetEncodeBy(df, "k", col("t"), m = 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val gmean = (100 * 10.0 + 100.0) / 101.0
    assert(math.abs(got("big") - 10.0) < 1.0)
    assert(got("tiny") > gmean - 1 && got("tiny") < 100.0,
      s"tiny=${got("tiny")} must sit between its own mean and the global")
    // exact closed form replayed
    assert(got("tiny") ==
      BigDecimal((100.0 + 10.0 * gmean) / 11.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("orderedConcat: order is the struct sort, not arrival; partitioning cannot matter") {
    import spark.implicits._
    val rows = Seq(("g", 3L, "c"), ("g", 1L, "a"), ("g", 2L, "b"),
      ("g", 1L, "a2"), ("h", 9L, "z"))
    Seq(1, 5).foreach { parts =>
      val got = rows.toDF("k", "o", "v").repartition(parts)
        .groupBy(col("k"))
        .agg(Analytics.orderedConcat(col("v"),
          Seq(col("o"), col("v")), "|").as("s"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("g" -> "a|a2|b|c", "h" -> "z"), s"parts=$parts")
    }
  }

  test("trimmedMeanBy: whale dropped, band edges inclusive, null drop") {
    import spark.implicits._
    // 1..10 plus a whale: p05/p95 of 1..10,1000 cut the whale; the
    // plain mean is dragged, the trimmed mean is not
    val df = ((1 to 10).map(i => ("g", i.toDouble)) :+ (("g", 1000.0)))
      .toDF("k", "v")
    val r = Analytics.trimmedMeanBy(df, "k", col("v"), 0.05, 0.95)
      .collect()(0)
    assert(r.getLong(1) == 11L)
    assert(r.getLong(2) < 11L, "the whale must fall outside the band")
    assert(r.getDouble(4) < 10.0, "trimmed mean is whale-proof")
    assert(r.getDouble(3) > 90.0, "plain mean is dragged")
    // full band keeps everything: trimmed == plain
    val all = Analytics.trimmedMeanBy(df, "k", col("v"), 0.0, 1.0)
      .collect()(0)
    assert(all.getLong(2) == 11L && all.getDouble(3) == all.getDouble(4))
    // nulls drop before fences and counts
    val withNull = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)))
      .toDF("k", "v")
    assert(Analytics.trimmedMeanBy(withNull, "k", col("v"))
      .collect()(0).getLong(1) == 2L)
  }

  test("decayedCounts: exact shift weights, half-life boundary, future exclusion, clamp") {
    import spark.implicits._
    val hl = 1000000L                       // 1-second half-life
    val asOf = 10000000L                    // t = 10 s
    val df = Seq(
      ("a", 10000000L),   // age 0        -> 2^40
      ("a", 9000001L),    // age just < 1 -> 2^40
      ("a", 9000000L),    // age == hl    -> 2^39 (boundary buckets UP)
      ("b", 8000000L),    // age 2 hl     -> 2^38
      ("b", 10000001L),   // FUTURE       -> excluded
      ("c", 1L)           // age ~10 hl   -> 2^31 (within clamp)
    ).toDF("k", "us").withColumn("ts", timestamp_micros(col("us")))
    val got = Analytics.decayedCounts(df, "k", col("ts"), asOf, hl)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((3L, (1L << 40) + (1L << 40) + (1L << 39))))
    assert(got("b") == ((1L, 1L << 38)), got("b").toString)
    assert(got("c") == ((1L, 1L << 31)))
    // ordering: decayed DESC, key ASC
    val order = Analytics.decayedCounts(df, "k", col("ts"), asOf, hl)
      .collect().map(_.getString(0)).toSeq
    assert(order == Seq("a", "b", "c"))
    // clamp: a row 100 half-lives old weighs 0 (shift stays defined)
    val old = Seq(("z", asOf - 100L * hl)).toDF("k", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val z = Analytics.decayedCounts(old, "k", col("ts"), asOf, hl)
      .collect()(0)
    assert(z.getLong(1) == 1L && z.getLong(2) == 0L)
  }

  test("giniCoefficient: equality -> 0; single holder -> (n-1)/n; hand case") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val eq = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "v")
    assert(Analytics.giniCoefficient(eq, "id", col("v"))
      .collect()(0).getAs[Double]("gini") == 0.0)
    val one = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 10.0))
      .toDF("id", "v")
    assert(Analytics.giniCoefficient(one, "id", col("v"))
      .collect()(0).getAs[Double]("gini") == 0.75)
    // hand case: x = (1,2,3,4): G = (2*(1+4+9+16) - 5*10)/(4*10) = 0.25
    val h = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    assert(Analytics.giniCoefficient(h, "id", col("v"))
      .collect()(0).getAs[Double]("gini") == 0.25)
  }

  test("giniCoefficientBucketed == giniCoefficient bit for bit on random tied frames, any bucket count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      // heavy ties on purpose: values drawn from a small lattice, so
      // tie groups straddle would-be bucket boundaries if they could
      val n = 50 + rnd.nextInt(150)
      val rows = (1L to n.toLong).map(i =>
        (i, (rnd.nextInt(12) * 25).toDouble + rnd.nextInt(3)))
      val df = rows.toDF("id", "v").repartition(1 + rnd.nextInt(5))
      val exact = Analytics.giniCoefficient(df, "id", col("v"))
        .collect()(0)
      for (b <- Seq(2, 7, 32)) {
        val got = Analytics.giniCoefficientBucketed(df, "id", col("v"), b)
          .collect()(0)
        assert(got.getLong(0) == exact.getLong(0) &&
          got.getDouble(1) == exact.getDouble(1) &&
          got.getDouble(2) == exact.getDouble(2),
          s"trial=$trial b=$b got=$got exact=$exact")
      }
    }
  }

  test("mutualInformation: independence -> ~0; identity -> ln 2; contributions sum to MI") {
    import spark.implicits._
    // independent 2x2 uniform: every pmi exactly ln(1) = 0
    val ind = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("x", "y")
    val ri = Analytics.mutualInformation(ind, "x", "y").collect()
    assert(ri.length == 4 && ri.forall(_.getAs[Double]("pmi_nats") == 0.0))
    // identity: X == Y over 2 values -> each cell pmi = ln 2, MI = ln 2
    val dep = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("x", "y")
    val rd = Analytics.mutualInformation(dep, "x", "y").collect()
    assert(rd.length == 2)
    rd.foreach(r => assert(math.abs(
      r.getAs[Double]("pmi_nats") - math.log(2)) < 1e-6))
    val mi = rd.map(_.getAs[Double]("mi_contrib_nats")).sum
    assert(math.abs(mi - math.log(2)) < 1e-6, mi.toString)
  }

  test("kaplanMeier: textbook ladder with censoring and a terminal zero") {
    import spark.implicits._
    // durations: 1(ev), 2(ev), 2(cens), 3(ev)
    // t=1: n=4, d=1, S=0.75; t=2: n=3, d=1, S=0.5; t=3: n=1=d, S=0
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1)).toDF("dur", "ev")
    val r = Analytics.kaplanMeier(df, "dur", "ev").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_risk"),
        x.getAs[Long]("n_events"), x.getAs[Double]("survival")))
    assert(r.toSeq == Seq((1L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5),
      (3L, 1L, 1L, 0.0)), r.mkString(","))
    // censored-only durations emit no row but stay in the risk set
    val c = Seq((1L, 1), (5L, 0), (9L, 1)).toDF("dur", "ev")
    val rc = Analytics.kaplanMeier(c, "dur", "ev").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_risk")))
    assert(rc.toSeq == Seq((1L, 3L), (9L, 1L)), rc.mkString(","))
  }
}
