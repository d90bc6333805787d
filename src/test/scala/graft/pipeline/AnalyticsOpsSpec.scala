package graft.pipeline

import graft.SparkSpec
import graft.operators.{Aggregates, Relational}
import org.apache.spark.sql.functions._

/** Journey paths, rolling windows, OHLC bars, top-N+OTHER and the
  * two-proportion z-test on hand-computed fixtures. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("topPaths: ordered prefixes, short users keep their depth") {
    val df = Seq(
      (1L, ts(10), "a", 1L), (1L, ts(20), "b", 2L), (1L, ts(30), "c", 3L),
      (1L, ts(40), "d", 4L), // beyond depth 3 — ignored
      (2L, ts(10), "a", 5L), (2L, ts(20), "b", 6L), (2L, ts(30), "c", 7L),
      (3L, ts(10), "a", 8L) // short user
    ).toDF("u", "t", "et", "id")
    withPartitionings(df) { d =>
      val out = rows(Events.topPaths(d, "u", "t", "et", "id", depth = 3)
        .orderBy("path"))
      assert(out == Seq(Seq("a", 1, 1L), Seq("a>b>c", 3, 2L)), s"got $out")
    }
  }

  test("topPaths: same-timestamp events break ties on the tie column") {
    val df = Seq((1L, ts(10), "x", 2L), (1L, ts(10), "y", 1L))
      .toDF("u", "t", "et", "id")
    val out = rows(Events.topPaths(df, "u", "t", "et", "id", 2))
    assert(out == Seq(Seq("y>x", 2, 1L)), s"got $out")
  }

  test("movingStats: trailing window, exact short heads") {
    val df = Seq((1L, ts(1), 10.0, 1L), (1L, ts(2), 20.0, 2L),
      (1L, ts(3), 60.0, 3L)).toDF("u", "t", "v", "id")
    val out = rows(TimeSeries.movingStats(df, "u", "t", "v", "id", lookback = 2)
      .orderBy("id").select("id", "win_n", "win_mean", "win_min", "win_max"))
    assert(out == Seq(
      Seq(1L, 1L, 10.0, 10.0, 10.0),
      Seq(2L, 2L, 15.0, 10.0, 20.0),
      Seq(3L, 2L, 40.0, 20.0, 60.0)), s"got $out")
  }

  test("ohlcBars: open/close by time with price tie-break, exact vwap") {
    val df = Seq(
      ("k", ts(3600), 5.0, 2.0), ("k", ts(3700), 9.0, 1.0),
      ("k", ts(3800), 1.0, 1.0),
      // same-second pair: open must be the LOWER price of the tie
      ("j", ts(100), 7.0, 1.0), ("j", ts(100), 3.0, 1.0)
    ).toDF("k", "t", "p", "vol")
    withPartitionings(df) { d =>
      val out = rows(TimeSeries.ohlcBars(d, "k", "t", "p", "vol", "day")
        .orderBy("k").select("k", "n", "open", "high", "low", "close", "vwap", "volume"))
      // k: open 5 (t=3600), close 1 (t=3800); vwap = (10+9+1)/4 = 5
      assert(out == Seq(
        Seq("j", 2L, 3.0, 7.0, 3.0, 7.0, 5.0, 2.0),
        Seq("k", 3L, 5.0, 9.0, 1.0, 1.0, 5.0, 4.0)), s"got $out")
    }
  }

  test("topNOther: tail folds into OTHER, measures conserved") {
    val df = Seq(("a", 100), ("a", 50), ("b", 60), ("c", 30), ("d", 10))
      .toDF("cat", "m")
    val out = rows(Aggregates.topNOther(df, "cat", "m", n = 2)
      .orderBy("category").selectExpr("category", "cast(measure_sum as double)", "n_rows"))
    assert(out == Seq(Seq("OTHER", 40.0, 2L), Seq("a", 150.0, 2L),
      Seq("b", 60.0, 1L)), s"got $out")
  }

  test("propTest2: counts and z match the hand calculation") {
    // arm A: 3 trials 2 successes; arm B: 2 trials 0 successes
    val df = Seq(("A", 1), ("A", 1), ("A", 0), ("B", 0), ("B", 0))
      .toDF("g", "s")
    val out = rows(Profile.propTest2(df, "g", col("s") === 1, "A", "B"))
    val pp = 2.0 / 5.0
    val z = math.rint((2.0 / 3.0 - 0.0) /
      math.sqrt(pp * (1 - pp) * (1.0 / 3.0 + 1.0 / 2.0)) * 1e6) / 1e6
    assert(out == Seq(Seq(3L, 2L, 2L, 0L, 0.666667, 0.0, z)), s"got $out")
  }

  test("readSnapshot with mergeSchema: later-version columns NULL-fill older files") {
    val base = java.nio.file.Files.createTempDirectory("graft_se_spec").toString
    try {
      Relational.fileOutput(Seq((1L, 10.0)).toDF("k", "v"), s"$base/f0")
      Relational.commitVersion(base, 0, Seq(s"$base/f0"), Nil)
      Relational.fileOutput(Seq((2L, 20.0, "new")).toDF("k", "v", "tag"), s"$base/f1")
      Relational.commitVersion(base, 1, Seq(s"$base/f1"), Nil)
      val out = rows(Relational.readSnapshot(spark, base, mergeSchema = true)
        .orderBy("k").select("k", "v", "tag"))
      assert(out == Seq(Seq(1L, 10.0, null), Seq(2L, 20.0, "new")), s"got $out")
    } finally {
      graft.streaming.Streams.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("hoppingWindows: each event lands in exactly size/slide windows") {
    // size 30 s, slide 10 s: event at t covers starts t0, t0-10, t0-20
    val df = Seq(("k", 25L, 1.0), ("k", 35L, 2.0)).toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val out = rows(TimeSeries.hoppingWindows(df, "k", "ts", "v",
      sizeSec = 30, slideSec = 10).orderBy("window_start_us"))
    // event@25 covers starts {20,10,0}; event@35 covers {30,20,10}
    assert(out.map(r => (r(1).asInstanceOf[Long] / 1000000L, r(2), r(3))) ==
      Seq((0L, 1L, 1.0), (10L, 2L, 3.0), (20L, 2L, 3.0), (30L, 1L, 2.0)))
    assert(out.head(4).asInstanceOf[Long] -
      out.head(1).asInstanceOf[Long] == 30000000L)
    intercept[IllegalArgumentException] {
      TimeSeries.hoppingWindows(df, "k", "ts", "v", 25, 10)
    }
  }

  test("rateLimitFlags: trailing window is (t-W, t] and ties see each other") {
    val df = Seq((1L, 0L), (2L, 1000L), (3L, 3600L), (4L, 3601L),
      (5L, 3601L)).toDF("id", "sec")
      .select(col("id"), lit(7L).as("u"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = rows(Events.rateLimitFlags(df, Seq("u"), "ts",
      limitN = 3, windowSec = 3600).select("id", "window_count", "over_limit")
      .orderBy("id"))
    // the window is half-open (t-3600, t]: id1@0 sits EXACTLY 3600 s
    // before id3@3600 and is aged out; id4/id5 are simultaneous and
    // count each other plus id2 and id3
    assert(out == Seq(Seq(1L, 1L, false), Seq(2L, 2L, false),
      Seq(3L, 2L, false), Seq(4L, 4L, true), Seq(5L, 4L, true)))
  }

  test("funnelLatency: first from-stage to first strictly-later to-stage") {
    val df = Seq((1L, 10L, "view"), (1L, 5L, "purchase"), // before: no
      (1L, 30L, "purchase"), (1L, 50L, "purchase"), // first after wins
      (2L, 10L, "view"), (3L, 40L, "purchase")) // 2 never buys, 3 never views
      .toDF("u", "sec", "tp")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"), col("tp"))
    val out = rows(Events.funnelLatency(df, "u", "ts", "tp",
      "view", "purchase"))
    assert(out == Seq(Seq(1L, 10000000L, 30000000L, 20000000L)))
  }

  test("weightedPercentiles: weighted median differs from the row median") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("g", 10.0, 97.0)).toDF("g", "v", "w")
    import graft.pipeline.Profile
    val out = rows(Profile.weightedPercentiles(df, "g", "v", "w",
      Seq(0.5)).orderBy("p"))
    // half the WEIGHT (50 of 100) is reached only at v=10
    assert(out == Seq(Seq("g", 0.5, 100.0, 10.0)))
    val unif = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0))
      .toDF("g", "v", "w")
    assert(rows(Profile.weightedPercentiles(unif, "g", "v", "w",
      Seq(0.5))).head(3) == 2.0)
  }
}
