package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sweep-line concurrency, exact ROC AUC, and Gini coefficient semantics
  * on hand-built inputs, including the brute-force cross-checks.
  */
class EvalStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- concurrency

  private def iv(rows: (String, Long, Long)*) =
    rows.toDF("k", "s", "e")

  test("concurrencyProfile: overlapping intervals peak correctly") {
    val df = iv(("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L))
    withPartitionings(df) { d =>
      val out = rows(Events.concurrencyProfile(d, Seq("k"), "s", "e"))
      // [0,10) and [5,15) overlap on [5,10); at t=10 the first releases
      // as the third acquires — peak stays 2, first reached at t=5.
      assert(out == Seq(Seq("a", 3L, 2L, 5L)))
    }
  }

  test("concurrencyProfile: half-open — end releases before start acquires") {
    val df = iv(("a", 0L, 10L), ("a", 10L, 20L))
    val out = rows(Events.concurrencyProfile(df, Seq("k"), "s", "e"))
    assert(out == Seq(Seq("a", 2L, 1L, 0L)))
  }

  test("concurrencyProfile: keys independent; empty interval adds nothing") {
    val df = iv(("a", 0L, 1L), ("b", 0L, 5L), ("b", 2L, 7L),
      ("b", 3L, 3L)) // [3,3) is empty: counted but never concurrent
    val out = rows(Events.concurrencyProfile(df, Seq("k"), "s", "e")
      .orderBy("k"))
    assert(out == Seq(Seq("a", 1L, 1L, 0L), Seq("b", 3L, 2L, 2L)))
  }

  test("concurrencyProfile: brute-force cross-check on a dense fixture") {
    val data = (0 until 60).map { i =>
      val s = (i * 37 % 50).toLong
      ("k", s, s + 1 + (i * 13 % 9))
    }
    val df = data.toDF("k", "s", "e")
    val out = rows(Events.concurrencyProfile(df, Seq("k"), "s", "e")).head
    // brute force: concurrency at instant t = #intervals with s <= t < e
    val instants = data.flatMap(r => Seq(r._2, r._3)).distinct.sorted
    val conc = instants.map(t => (t, data.count(r => r._2 <= t && t < r._3)))
    val peak = conc.map(_._2).max
    val at = conc.filter(_._2 == peak).map(_._1).min
    assert(out == Seq("k", data.size.toLong, peak.toLong, at))
  }

  // ---------------------------------------------------------------- rocAuc

  test("rocAuc: perfect separation, reversal, and all-tied") {
    val perfect = Seq((1.0, true), (2.0, true), (0.1, false), (0.2, false))
      .toDF("score", "lab")
    assert(rows(Profile.rocAuc(perfect, "score", col("lab"))).head ==
      Seq(2L, 2L, 8L, 1.0))
    val reversed = Seq((0.1, true), (0.2, true), (1.0, false), (2.0, false))
      .toDF("score", "lab")
    assert(rows(Profile.rocAuc(reversed, "score", col("lab"))).head ==
      Seq(2L, 2L, 0L, 0.0))
    val tied = Seq((5.0, true), (5.0, true), (5.0, false), (5.0, false))
      .toDF("score", "lab")
    assert(rows(Profile.rocAuc(tied, "score", col("lab"))).head ==
      Seq(2L, 2L, 4L, 0.5))
  }

  test("rocAuc: equals brute-force pair counting with ties; NULLs excluded") {
    val data = (0 until 80).map(i => (i * 31 % 13, i % 3 == 0))
    val df = data.map(r => (Some(r._1.toDouble), r._2)).toDF("score", "lab")
      .unionByName(Seq((Option.empty[Double], true)).toDF("score", "lab"))
    withPartitionings(df) { d =>
      val out = rows(Profile.rocAuc(d, "score", col("lab"))).head
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      val twoU = (for { p <- pos; n <- neg } yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      val auc = BigDecimal(twoU.toDouble / (2.0 * pos.size * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out == Seq(pos.size.toLong, neg.size.toLong, twoU, auc))
    }
  }

  // ---------------------------------------------------------------- gini

  test("gini: uniform is 0, total concentration is (n-1)/n") {
    val eq = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("g", "x")
    assert(rows(Profile.gini(eq, "g", "x")).head == Seq("a", 3L, 15.0, 0.0))
    val conc = Seq(("a", 0.0), ("a", 0.0), ("a", 0.0), ("a", 10.0))
      .toDF("g", "x")
    assert(rows(Profile.gini(conc, "g", "x")).head ==
      Seq("a", 4L, 10.0, 0.75))
  }

  test("gini: NULL and negative excluded; zero-sum group reports NULL") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(-3.0)),
      ("a", Some(3.0)), ("z", Some(0.0))).toDF("g", "x")
    val out = rows(Profile.gini(df, "g", "x").orderBy("g"))
    // a keeps {1, 3}: G = (2*(1*1+2*3) - 3*4) / (2*4) = 2/8 = 0.25
    assert(out == Seq(Seq("a", 2L, 4.0, 0.25), Seq("z", 1L, 0.0, null)))
  }

  // ---------------------------------------------------------------- cusum

  test("cusum: closed form equals the textbook recursion") {
    // target 10, slack 1, threshold 3; a level shift then a drop
    val xs = Seq(10.0, 10.0, 15.0, 15.0, 2.0, 2.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "t", "v")
    withPartitionings(df) { d =>
      val out = rows(TimeSeries.cusum(d, "k", "t", "v", "t",
        target = BigDecimal(10), slack = BigDecimal(1),
        threshold = BigDecimal(3)).orderBy("t"))
      // recursion: S+ = max(0, S+ + x-11): 0,0,4,8,0,0
      //            S- = max(0, S- - (x-9)): 0,0,0,0,7,14
      assert(out.map(_(2)) == Seq(0.0, 0.0, 4.0, 8.0, 0.0, 0.0))
      assert(out.map(_(3)) == Seq(0.0, 0.0, 0.0, 0.0, 7.0, 14.0))
      assert(out.map(_(4)) == Seq(false, false, true, true, false, false))
      assert(out.map(_(5)) == Seq(false, false, false, false, true, true))
    }
  }

  test("cusum: brute-force recursion cross-check on a noisy series") {
    val xs = (0 until 100).map(i => ((i * 37 % 23) - 11).toDouble)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "t", "v")
    val out = rows(TimeSeries.cusum(df, "k", "t", "v", "t",
      target = BigDecimal(0), slack = BigDecimal("0.5"),
      threshold = BigDecimal(10)).orderBy("t"))
    var sh = BigDecimal(0); var sl = BigDecimal(0)
    xs.zip(out).foreach { case (x, r) =>
      sh = (sh + (BigDecimal(x) - BigDecimal("0.5"))).max(0)
      sl = (sl - (BigDecimal(x) + BigDecimal("0.5"))).max(0)
      assert(r(2) == sh.toDouble && r(3) == sl.toDouble, s"at t=${r(1)}")
    }
  }

  // ---------------------------------------------------------------- autocorr

  test("autocorrLag: a perfectly linear series autocorrelates to ~1") {
    val df = (0 until 50).map(i => ("k", i.toLong, i.toDouble))
      .toDF("k", "t", "v")
    val out = rows(TimeSeries.autocorrLag(df, "k", "t", "v", "t", lagK = 2))
    assert(out.head(1) == 48L) // 50 - lag
    assert(math.abs(out.head(2).asInstanceOf[Double] - 1.0) < 1e-9)
  }

  test("autocorrLag: alternating series has lag-1 corr -1, lag-2 corr +1") {
    val df = (0 until 40).map(i => ("k", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "v")
    val r1 = rows(TimeSeries.autocorrLag(df, "k", "t", "v", "t", 1)).head
    val r2 = rows(TimeSeries.autocorrLag(df, "k", "t", "v", "t", 2)).head
    assert(math.abs(r1(2).asInstanceOf[Double] + 1.0) < 1e-9)
    assert(math.abs(r2(2).asInstanceOf[Double] - 1.0) < 1e-9)
  }

  // ---------------------------------------------------------------- classifierEval

  test("classifierEval: confusion counts and metrics; NULL on empty slices") {
    val df = Seq((0.9, true), (0.8, false), (0.2, true), (0.1, false))
      .toDF("score", "lab")
    val out = rows(Profile.classifierEval(df, "score", col("lab"), 0.5)).head
    assert(out == Seq(1L, 1L, 1L, 1L, 0.5, 0.5, 0.5, 0.5))
    // no positive predictions: precision NULL, recall 0
    val low = rows(Profile.classifierEval(df, "score", col("lab"), 2.0)).head
    assert(low(0) == 0L && low(1) == 0L)
    assert(low(4) == null && low(5) == 0.0 && low(6) == null)
  }

  // ---------------------------------------------------------------- hillTail

  test("hillTail: hand-computed alpha with ties at x_k contributing zero") {
    val df = Seq(8.0, 4.0, 4.0, 1.0, 0.0, -2.0).map(Tuple1(_)).toDF("v")
    withPartitionings(df) { d =>
      val out = rows(Profile.hillTail(d, "v", k = 3)).head
      // positives only: [8,4,4,1]; suffix ranks: 8→1, 4→3 ⇒ x_k = 4;
      // only 8 > x_k: ln(2) → 0.693147; α = 3/0.693147
      val alpha = BigDecimal(3.0 / 0.693147)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out == Seq(3, 4L, 4.0, alpha))
    }
  }

  // ---------------------------------------------------------------- seasonalProfile

  test("seasonalProfile: hour slots, means and shares; ISO dow mapping") {
    val df = Seq(("a", "2024-01-01 09:10:00", 10.0),
      ("a", "2024-01-01 09:50:00", 20.0),
      ("a", "2024-01-01 17:00:00", 30.0),
      ("b", "2024-01-07 23:00:00", 5.0)) // 2024-01-07 is a Sunday
      .toDF("k", "t", "v")
      .select(col("k"), to_timestamp(col("t")).as("ts"), col("v"))
    val hourly = rows(TimeSeries.seasonalProfile(df, "k", "ts", "v")
      .orderBy("k", "slot"))
    assert(hourly == Seq(Seq("a", 9, 2L, 15.0, 0.5),
      Seq("a", 17, 1L, 30.0, 0.5), Seq("b", 23, 1L, 5.0, 1.0)))
    val dow = rows(TimeSeries.seasonalProfile(df, "k", "ts", "v", "dow")
      .orderBy("k", "slot"))
    assert(dow.map(r => (r.head, r(1))) == Seq(("a", 1), ("b", 7)))
  }

  // ---------------------------------------------------------------- blockingQuality

  test("blockingQuality: reduction ratio and pair completeness by hand") {
    val l = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("lid", "blk")
    val r = Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("rid", "blk")
    val truth = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("lid", "rid")
    val out = rows(Dedup.blockingQuality(l, r, "blk", "lid", "rid", truth))
      .head
    // candidates: a→2·1 + b→1·2 = 4 of 9; truth pair 2 blocks a vs b
    assert(out == Seq(3L, 3L, 4L, 3L, 2L, 0.555556, 0.666667))
  }

  // ---------------------------------------------------------------- psi / mutualInfo

  test("psi: identical samples score 0; a shifted sample scores > 0") {
    val a = (1 to 50).map(i => Tuple1((i % 10).toDouble)).toDF("v")
    val same = rows(Profile.psi(a, a, "v", 0.0, 10.0, 5)).head
    assert(same == Seq(50L, 50L, 0.0))
    val b = (1 to 50).map(i => Tuple1((i % 10).toDouble + 5.0)).toDF("v")
    val shifted = rows(Profile.psi(a, b, "v", 0.0, 10.0, 5)).head
    assert(shifted(2).asInstanceOf[Double] > 0.5)
  }

  test("mutualInfo: independence gives 0, identity gives ln 2") {
    val indep = (0 until 40).map(i => (s"x${i % 2}", s"y${i / 2 % 2}"))
      .toDF("x", "y")
    assert(rows(Profile.mutualInfo(indep, "x", "y")).head == Seq(40L, 0.0))
    val ident = (0 until 40).map(i => (s"v${i % 2}", s"v${i % 2}"))
      .toDF("x", "y")
    val mi = rows(Profile.mutualInfo(ident, "x", "y")).head
    assert(mi(1) == 0.693147) // ln 2, 6 dp
  }

  // ---------------------------------------------------------------- pathStats

  test("pathStats: L1 length, segment handling, net displacement") {
    val df = Seq(("a", 1L, 0L, 0L), ("a", 2L, 3L, 4L), ("a", 3L, 3L, 0L),
      ("b", 1L, 5L, 5L)).toDF("k", "seq", "x", "y")
    withPartitionings(df) { d =>
      val out = rows(Spatial.pathStats(d, Seq("k"), "x", "y", "seq")
        .orderBy("k"))
      // a: |3|+|4| + |0|+|4| = 11; net = |3-0|+|0-0| = 3; b: single point
      assert(out == Seq(Seq("a", 3L, 11L, 3L), Seq("b", 1L, 0L, 0L)))
    }
  }

  // ---------------------------------------------------------------- linearAttribution

  test("linearAttribution: exact mills with remainder to the earliest touch") {
    val df = Seq((1L, 10L, "view", 1L), (1L, 20L, "click", 2L),
      (1L, 30L, "view", 3L), (1L, 40L, "purchase", 4L),
      (1L, 50L, "view", 5L), // after conversion: no credit
      (2L, 10L, "view", 6L)) // never converts
      .toDF("u", "sec", "tp", "id")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"), col("tp"),
        col("id"))
    val out = rows(Events.linearAttribution(df, "u", "ts", "tp", "id",
      Seq("view", "click"), "purchase").orderBy("id"))
    assert(out.map(r => (r(1), r.last)) ==
      Seq((1L, 333334L), (2L, 333333L), (3L, 333333L)))
    assert(out.map(_.last.asInstanceOf[Long]).sum == 1000000L)
    intercept[IllegalArgumentException] {
      Events.linearAttribution(df, "u", "ts", "tp", "id",
        Seq("view"), "view")
    }
  }

  // ---------------------------------------------------------------- pointInPolygon

  test("pointInPolygon: square, notch of an L-shape, and outside") {
    val l = Seq((0L, 0L), (4L, 0L), (4L, 2L), (2L, 2L), (2L, 4L), (0L, 4L))
    val pts = Seq((1L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 3L), (4L, 3L, 3L),
      (5L, 5L, 1L), (6L, 1L, 5L)).toDF("id", "x", "y")
    val out = rows(Spatial.pointInPolygon(pts, "id", "x", "y", l)
      .orderBy("id")).map(r => (r.head, r(3)))
    // (3,3) sits in the notch — non-convexity is what's under test
    assert(out == Seq((1L, true), (2L, true), (3L, true), (4L, false),
      (5L, false), (6L, false)))
  }

  test("pointInPolygon: awt cross-check on a staircase polygon, odd grid") {
    // rectilinear staircase with even vertices; odd-coordinate points can
    // never lie on a boundary, so awt's boundary ambiguity is avoided
    val poly = Seq((0L, 0L), (6L, 0L), (6L, 4L), (4L, 4L), (4L, 8L),
      (8L, 8L), (8L, 12L), (0L, 12L))
    val awt = new java.awt.geom.Path2D.Double()
    awt.moveTo(poly.head._1.toDouble, poly.head._2.toDouble)
    poly.tail.foreach(p => awt.lineTo(p._1.toDouble, p._2.toDouble))
    awt.closePath()
    val pts = (for { x <- -1L to 9L by 2; y <- -1L to 13L by 2 }
      yield (x * 100 + y, x, y)).toDF("id", "x", "y")
    withPartitionings(pts) { d =>
      val out = rows(Spatial.pointInPolygon(d, "id", "x", "y", poly))
      out.foreach { r =>
        val (x, y) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
        assert(r(3) == awt.contains(x.toDouble, y.toDouble),
          s"mismatch at ($x,$y)")
      }
    }
  }

  test("pointInPolygon rejects degenerate polygons") {
    val pts = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Spatial.pointInPolygon(pts, "id", "x", "y", Seq((0L, 0L), (1L, 1L)))
    }
  }

  // ---------------------------------------------------------------- kaplanMeier

  test("kaplanMeier: textbook curve with censoring and an all-die tail") {
    val df = Seq(("a", 1L, true), ("a", 2L, true), ("a", 2L, false),
      ("a", 3L, true)).toDF("g", "dur", "ev")
    withPartitionings(df) { d =>
      val out = rows(Events.kaplanMeier(d, "g", "dur", col("ev"))
        .orderBy("t"))
      // S(1)=3/4; S(2)=3/4·2/3=1/2; at t=3 everyone at risk dies → 0
      assert(out == Seq(
        Seq("a", 1L, 4L, 1L, 0.75),
        Seq("a", 2L, 3L, 1L, 0.5),
        Seq("a", 3L, 1L, 1L, 0.0)))
    }
  }

  test("kaplanMeier: censored subjects shape the risk set but emit no row") {
    val df = Seq(("b", 1L, false), ("b", 2L, true)).toDF("g", "dur", "ev")
    val out = rows(Events.kaplanMeier(df, "g", "dur", col("ev")))
    // the t=1 censor has left the risk set by t=2: n=1, d=1 → survival 0
    assert(out == Seq(Seq("b", 2L, 1L, 1L, 0.0)))
  }

  // ---------------------------------------------------------------- theilSen

  test("theilSen: robust to an outlier that would tilt OLS") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0),
      ("a", 4.0, 100.0)).toDF("g", "x", "y")
    withPartitionings(df) { d =>
      val out = rows(Profile.theilSen(d, "g", "x", "y")).head
      // pair slopes sorted: [1,1,1,33,49,97] → lower median 1;
      // residuals y−x: [0,0,0,96] → lower median 0
      assert(out == Seq("a", 4L, 6L, 1.0, 0.0))
    }
  }

  test("theilSen: equal-x pairs are skipped per the estimator") {
    val df = Seq(("a", 1.0, 1.0), ("a", 1.0, 5.0), ("a", 2.0, 2.0))
      .toDF("g", "x", "y")
    val out = rows(Profile.theilSen(df, "g", "x", "y")).head
    // only two valid pairs: slopes {1, −3} → lower median −3
    assert(out(2) == 2L && out(3) == -3.0)
  }

  // ---------------------------------------------------------------- standardize

  test("standardize: textbook z-scores; constant group yields NULL") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("c", 7.0), ("c", 7.0)).toDF("g", "v")
    val out = rows(Profile.standardize(df, "g", "v").orderBy("g", "v"))
    assert(out.map(_(2)) == Seq(-1.0, 0.0, 1.0, null, null))
  }

  // ---------------------------------------------------------------- imputeMean

  test("imputeMean: NULLs get the group mean; all-NULL group stays NULL") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(3.0)),
      ("z", 4L, None)).toDF("g", "id", "v")
    val out = rows(Profile.imputeMean(df, "g", "v", "f").orderBy("id"))
    assert(out.map(_(3)) == Seq(1.0, 2.0, 3.0, null))
    assert(out.map(_(4)) == Seq(false, true, false, false))
  }

  // ---------------------------------------------------------------- targetEncodeLoo

  test("targetEncodeLoo: each row sees only the OTHER rows' mean") {
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("b", 4L, Some(5.0)), ("a", 5L, None))
      .toDF("c", "id", "t")
    val out = rows(Scoring.targetEncodeLoo(df, "c", "t", "enc")
      .orderBy("id"))
    // LOO means: (60−10)/2=25, 20, 15; singleton b → NULL; the NULL-
    // target row gets the plain category mean 20
    assert(out.map(_(3)) == Seq(25.0, 20.0, 15.0, null, 20.0))
  }

  // ---------------------------------------------------------------- cumulativeUnique

  test("cumulativeUnique: active / first-seen / running total per day") {
    val df = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-02 11:00:00"), (2L, "2024-01-02 12:00:00"),
      (3L, "2024-01-03 09:00:00")).toDF("u", "t")
      .select(col("u"), to_timestamp(col("t")).as("ts"))
    withPartitionings(df) { d =>
      val out = rows(Events.cumulativeUnique(d, "u", "ts")
        .select(date_format(col("period"), "yyyy-MM-dd"), col("active"),
          col("first_seen"), col("cumulative")).orderBy("period"))
      assert(out == Seq(Seq("2024-01-01", 1L, 1L, 1L),
        Seq("2024-01-02", 2L, 1L, 2L), Seq("2024-01-03", 1L, 1L, 3L)))
    }
  }

  test("gini: tie order cannot change the statistic") {
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 2.0), ("a", 6.0))
      .toDF("g", "x")
    withPartitionings(df) { d =>
      // x sorted: ranks of the tied 2s are {1,2,3} in SOME order;
      // sum r*x over the block is 2*(1+2+3) regardless.
      // G = (2*(2+4+6+24) - 5*12) / (4*12) = 12/48 = 0.25
      assert(rows(Profile.gini(d, "g", "x")).head ==
        Seq("a", 4L, 12.0, 0.25))
    }
  }

  // ---------------------------------------------------------------- isotonicFit

  test("isotonicFit: violating bins pool to their weighted mean (PAVA)") {
    // bin means: 0.0, 0.8, 0.2, 1.0 — bins 2 and 3 (0.8 then 0.2)
    // violate monotonicity; PAVA pools them. Weights: bin2 has 1 point,
    // bin3 has 3 points → pooled level (0.8·1 + 0.2·3·... ) — use exact
    // 0/1 labels: bin x=1: one 1 (mean 1·0.8? no — craft directly):
    val df = Seq(
      ("g", 0L, 0), ("g", 0L, 0),                    // mean 0
      ("g", 1L, 1), ("g", 1L, 1), ("g", 1L, 1), ("g", 1L, 0), ("g", 1L, 0), // 0.6
      ("g", 2L, 0), ("g", 2L, 0), ("g", 2L, 1),      // 0.333…
      ("g", 3L, 1), ("g", 3L, 1)                     // mean 1
    ).toDF("grp", "x", "y")
    withPartitionings(df) { d =>
      val out = rows(Profile.isotonicFit(d, "grp", "x", "y").orderBy("x"))
      // bins 1 (w=5, sum 3) and 2 (w=3, sum 1) pool: 4/8 = 0.5
      assert(out == Seq(
        Seq("g", 0L, 2L, 0.0, 0.0),
        Seq("g", 1L, 5L, 0.6, 0.5),
        Seq("g", 2L, 3L, 0.333333, 0.5),
        Seq("g", 3L, 2L, 1.0, 1.0)))
      // fitted is monotone non-decreasing in x
      val f = out.map(_(4).asInstanceOf[Double])
      assert(f == f.sorted)
    }
  }

  test("isotonicFit: already-monotone input is returned unchanged") {
    val df = Seq(("a", 1L, 0), ("a", 2L, 1), ("a", 2L, 1), ("a", 3L, 1))
      .toDF("grp", "x", "y")
    val out = rows(Profile.isotonicFit(df, "grp", "x", "y").orderBy("x"))
    assert(out.map(r => (r(1), r(4))) ==
      Seq((1L, 0.0), (2L, 1.0), (3L, 1.0)))
  }

  // ---------------------------------------------------------------- rankingMetrics

  test("rankingMetrics: hand-computed NDCG/MRR/AP with the 6-dp convention") {
    // query A ranked by score desc: ids 1(rel),2,3(rel),4 → ranks 1..4.
    val df = Seq(("A", 9.0, 1L, true), ("A", 7.0, 2L, false),
      ("A", 5.0, 3L, true), ("A", 3.0, 4L, false),
      ("B", 4.0, 5L, false), ("B", 2.0, 6L, false)).toDF("q", "s", "id", "r")
    withPartitionings(df) { d =>
      val out = rows(Profile.rankingMetrics(d, "q", "s", "id", col("r"),
        k = 10).orderBy("q"))
      // DCG = 1/log2(2) + 1/log2(4) = 1 + 0.5; IDCG = 1/log2(2) +
      // 1/log2(3) = 1 + 0.630930; NDCG = 1.5/1.630930 = 0.919721
      // MRR = 1/1; AP = (1/1 + 2/3)/2 = (1 + 0.666667)/2 = 0.833334
      assert(out == Seq(
        Seq("A", 4L, 2L, 0.919721, 1.0, 0.833334),
        Seq("B", 2L, 0L, null, null, null)))
    }
  }

  test("rankingMetrics: k truncates the DCG window but not AP/MRR") {
    // relevant at ranks 2 and 3 with k=2: DCG counts rank 2 only;
    // IDCG counts ideal ranks 1 and 2 — cr<=k keeps both ideal terms.
    val df = Seq(("q", 9.0, 1L, false), ("q", 8.0, 2L, true),
      ("q", 7.0, 3L, true)).toDF("q", "s", "id", "r")
    val out = rows(Profile.rankingMetrics(df, "q", "s", "id", col("r"),
      k = 2)).head
    // DCG = 1/log2(3) = 0.630930; IDCG = 1 + 0.630930 = 1.630930
    // NDCG = 0.630930/1.630930 = 0.386853; MRR = 0.5; AP = (1/2 + 2/3)/2 = 0.583334
    assert(out == Seq("q", 3L, 2L, 0.386853, 0.5, 0.583334))
  }

  // ---------------------------------------------------------------- calibrationBins

  test("calibrationBins: exact decimal means, gap, and Brier terms") {
    val df = Seq((0L, "0.10", true), (0L, "0.30", false),
      (1L, "0.80", true), (1L, "0.60", true)).toDF("b", "ps", "lab")
      .select(col("b"), col("ps").cast("decimal(5,4)").as("p"), col("lab"))
    withPartitionings(df) { d =>
      val out = rows(Profile.calibrationBins(d, "b", "p", col("lab"))
        .orderBy("bin"))
      // bin 0: mean_p 0.2, rate 0.5, gap 0.3,
      //   brier = ((0.1-1)² + (0.3-0)²)/2 = (0.81+0.09)/2 = 0.45
      // bin 1: mean_p 0.7, rate 1.0, gap 0.3,
      //   brier = ((0.8-1)² + (0.6-1)²)/2 = (0.04+0.16)/2 = 0.1
      assert(out == Seq(
        Seq(0L, 2L, 1L, 0.2, 0.5, 0.3, 0.45),
        Seq(1L, 2L, 2L, 0.7, 1.0, 0.3, 0.1)))
    }
  }

  // ---------------------------------------------------------------- twap

  test("twap: holding durations weight the mean; singleton key is NULL") {
    // value 10 held 1µs..4µs (3), then 40 held 4..5 (1): (30+40)/4 = 17.5
    val df = Seq(("k", 1L, 10.0, 1L), ("k", 4L, 40.0, 2L),
      ("k", 5L, 0.0, 3L), ("solo", 9L, 7.0, 4L))
      .toDF("k", "tus", "v", "id")
      .select(col("k"), timestamp_micros(col("tus")).as("ts"), col("v"),
        col("id"))
    withPartitionings(df) { d =>
      val out = rows(TimeSeries.twap(d, "k", "ts", "v", "id").orderBy("k"))
      assert(out == Seq(Seq("k", 3L, 4L, 17.5), Seq("solo", 1L, 0L, null)))
    }
  }

  test("twap: same-timestamp duplicate carries zero weight deterministically") {
    val df = Seq(("k", 0L, 100.0, 1L), ("k", 0L, 2.0, 2L), ("k", 10L, 0.0, 3L))
      .toDF("k", "tus", "v", "id")
      .select(col("k"), timestamp_micros(col("tus")).as("ts"), col("v"),
        col("id"))
    // tie order by id: (0, v=100) gets Δt 0; (0, v=2) holds all 10 µs
    val out = rows(TimeSeries.twap(df, "k", "ts", "v", "id")).head
    assert(out == Seq("k", 3L, 10L, 2.0))
  }

  // ---------------------------------------------------------------- ewmaLags

  test("ewmaLags: textbook weights after warm-up; warm-up renormalizes") {
    val df = Seq(("k", 1L, 8.0), ("k", 2L, 4.0), ("k", 3L, 2.0))
      .toDF("k", "id", "v")
      .select(col("k"), timestamp_micros(col("id")).as("ts"), col("id"),
        col("v"))
    withPartitionings(df) { d =>
      val out = rows(TimeSeries.ewmaLags(d, "k", "ts", "v", "id",
        lookback = 2).select(col("id"), col("n_terms"), col("ewma"))
        .orderBy("id"))
      // lookback 2 → weights 4,2,1.
      // t1: 8                      → 8.0      (den 4)
      // t2: (4·4 + 8·2)/6 = 32/6   → 5.333333
      // t3: (2·4 + 4·2 + 8·1)/7    → 3.428571
      assert(out == Seq(Seq(1L, 1L, 8.0), Seq(2L, 2L, 5.333333),
        Seq(3L, 3L, 3.428571)))
    }
  }

  // ---------------------------------------------------------------- diffInDiff

  test("diffInDiff: textbook 2×2 contrast; empty cell yields NULL estimate") {
    val df = Seq((true, false, 10.0), (true, true, 25.0),
      (false, false, 8.0), (false, true, 13.0), (false, true, 15.0))
      .toDF("tr", "po", "v")
    withPartitionings(df) { d =>
      val out = rows(Profile.diffInDiff(d, col("tr"), col("po"), "v")).head
      // (25 − 10) − (14 − 8) = 9
      assert(out == Seq(5L, 10.0, 25.0, 8.0, 14.0, 9.0))
    }
    val missing = Seq((true, true, 5.0), (false, false, 1.0),
      (false, true, 2.0)).toDF("tr", "po", "v")
    val out2 = rows(Profile.diffInDiff(missing, col("tr"), col("po"), "v")).head
    assert(out2(1) == null && out2(5) == null)
  }
}
