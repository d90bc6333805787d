package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel + cohort-retention semantics on hand-built event logs. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("u", "t", "tp").select(col("u"),
      to_timestamp(col("t")).as("ts"), col("tp"))

  test("funnel: strict-after conversion, out-of-order stages don't count") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),   // u1 full path
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      (2L, "2024-01-01 09:00:00", "click"),  // u2: click BEFORE first view
      (2L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 10:00:00", "view"),   // u3: purchase without click
      (3L, "2024-01-01 10:30:00", "purchase"),
      (4L, "2024-01-01 10:00:00", "purchase")) // u4: never views
    val out = rows(Events.funnel(df, "u", "ts", "tp",
      Seq("view", "click", "purchase")).orderBy("stage"))
    assert(out.map(r => (r(0), r(2))) == Seq((1, 3L), (2, 1L), (3, 1L)))
    // conv is relative to stage 1
    assert(out(2)(3) == 1.0 / 3.0)
  }

  test("funnel: ts equal to the frontier does NOT convert (strictly after)") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"), // simultaneous — not after
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:00:01", "click"))
    val out = rows(Events.funnel(df, "u", "ts", "tp", Seq("view", "click"))
      .orderBy("stage"))
    assert(out.map(r => (r(0), r(2))) == Seq((1, 2L), (2, 1L)))
  }

  test("funnel: duplicate stage events keep the EARLIEST frontier") {
    // u1's second view (later) must not move the frontier past the click
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"))
    val out = rows(Events.funnel(df, "u", "ts", "tp", Seq("view", "click")))
    assert(out.find(_(0) == 2).get(2) == 1L)
  }

  test("funnel: maxGap cuts conversions that arrive too late") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),  // within 1 h — converts
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 12:00:01", "click"))  // 2 h later — cut
    val out = rows(Events.funnel(df, "u", "ts", "tp", Seq("view", "click"),
      maxGapSeconds = Some(3600L)).orderBy("stage"))
    assert(out.map(r => (r(0), r(2))) == Seq((1, 2L), (2, 1L)))
    // boundary: exactly maxGap after the frontier still converts (closed end)
    val df2 = ev(
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 11:00:00", "click"))
    val out2 = rows(Events.funnel(df2, "u", "ts", "tp", Seq("view", "click"),
      maxGapSeconds = Some(3600L)).orderBy("stage"))
    assert(out2.map(r => (r(0), r(2))) == Seq((1, 1L), (2, 1L)))
  }

  test("cohortRetention: weekly offsets are exact integer weeks") {
    val df = ev(
      (1L, "2024-01-02 10:00:00", "x"), // week of Mon 2024-01-01
      (1L, "2024-01-10 10:00:00", "x"), // week of Mon 2024-01-08 → offset 1
      (1L, "2024-01-22 10:00:00", "x"), // offset 3
      (2L, "2024-01-09 10:00:00", "x")) // cohort 2024-01-08, offset 0
    val out = rows(Events.cohortRetention(df, "u", "ts", "week")
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("offset"), col("users"))
      .orderBy("cohort", "offset"))
    assert(out == Seq(
      Seq("2024-01-01", 0L, 1L), Seq("2024-01-01", 1L, 1L),
      Seq("2024-01-01", 3L, 1L), Seq("2024-01-08", 0L, 1L)))
  }

  test("periodOverPeriod: previous OBSERVED bucket, NULL pct on first and zero base") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-01 11:00:00", 20.0), // same day: sums to 30
      (1L, "2024-01-02 10:00:00", 0.0),  // zero base for the NEXT delta
      (1L, "2024-01-05 10:00:00", 60.0)) // gap: prev = Jan 2, not Jan 4
      .toDF("u", "t", "v").select(col("u"), to_timestamp(col("t")).as("ts"), col("v"))
    val out = rows(Events.periodOverPeriod(df, "u", "ts", "v", "day")
      .select(col("u"), date_format(col("bucket"), "yyyy-MM-dd"), col("cur"),
        col("prev"), col("change"), col("pct_change"))
      .orderBy("bucket"))
    assert(out(0) == Seq(1L, "2024-01-01", 30.0, null, null, null))
    assert(out(1) == Seq(1L, "2024-01-02", 0.0, 30.0, -30.0, -1.0))
    assert(out(2) == Seq(1L, "2024-01-05", 60.0, 0.0, 60.0, null)) // zero base
  }

  test("cohortRetention: same user twice in one week counts once") {
    val df = ev(
      (1L, "2024-01-02 10:00:00", "x"),
      (1L, "2024-01-03 10:00:00", "x"),
      (2L, "2024-01-04 10:00:00", "x"))
    val out = rows(Events.cohortRetention(df, "u", "ts", "week"))
    // cohort buckets are civil NTZ (r9 timezone-invariance refactor), so
    // collected values are LocalDateTime, not java.sql.Timestamp
    assert(out == Seq(Seq(
      java.time.LocalDateTime.parse("2024-01-01T00:00"), 0L, 2L)))
  }

  test("rateAnomaly: trailing z-score with warmup NULLs and a spike flagged") {
    // hourly counts 1, 3, 2, 8 with window=2
    val df = (Seq.fill(1)("2024-01-01 00:30:00") ++ Seq.fill(3)("2024-01-01 01:30:00") ++
              Seq.fill(2)("2024-01-01 02:30:00") ++ Seq.fill(8)("2024-01-01 03:30:00"))
      .toDF("t").select(to_timestamp(col("t")).as("ts"))
    withPartitionings(df) { dd =>
      val out = rows(Events.rateAnomaly(dd, "ts", "hour", window = 2,
        zThreshold = 2.0).orderBy("bucket"))
      assert(out.map(r => (r(1), r(2), r(3))) == Seq(
        (1L, null, false),          // no baseline
        (3L, null, false),          // only 1 predecessor
        (2L, 0.0, false),           // frame (1,3): mean 2, z = 0
        (8L, 7.778175, true)))      // frame (3,2): z = 5.5/sqrt(0.5)
    }
  }

  test("attribution: last vs first touch, strictly-before frame, organic NULL") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:05:00", "click"),
      (3L, 1L, "2024-01-01 10:10:00", "purchase"), // last: click, first: view
      (4L, 1L, "2024-01-01 10:20:00", "purchase"), // no new touch: same credit
      (5L, 2L, "2024-01-01 09:00:00", "purchase"), // organic: no touch
      (6L, 3L, "2024-01-02 08:00:00", "purchase"), // touch at SAME ts, smaller
      (7L, 3L, "2024-01-02 08:00:00", "view"))     // id AFTER conv: no credit
      .toDF("id", "u", "t", "tp")
      .select(col("id"), col("u"), to_timestamp(col("t")).as("ts"), col("tp"))
    withPartitionings(df) { dd =>
      val last = rows(Events.attribution(dd, "u", "ts", "id", "tp",
        "purchase", Seq("view", "click"), "last").orderBy("conversion_id"))
      assert(last == Seq(
        Seq(3L, 1L, ts("2024-01-01 10:10:00"), "click", ts("2024-01-01 10:05:00")),
        Seq(4L, 1L, ts("2024-01-01 10:20:00"), "click", ts("2024-01-01 10:05:00")),
        Seq(5L, 2L, ts("2024-01-01 09:00:00"), null, null),
        Seq(6L, 3L, ts("2024-01-02 08:00:00"), null, null)))
      val first = rows(Events.attribution(dd, "u", "ts", "id", "tp",
        "purchase", Seq("view", "click"), "first").orderBy("conversion_id"))
      assert(first.take(2) == Seq(
        Seq(3L, 1L, ts("2024-01-01 10:10:00"), "view", ts("2024-01-01 10:00:00")),
        Seq(4L, 1L, ts("2024-01-01 10:20:00"), "view", ts("2024-01-01 10:00:00"))))
    }
  }

  test("mergeIntervals: overlap and touch merge; strict gap splits; " +
    "containment absorbed") {
    val df = Seq(
      (1L, 0L, 10L),   // island 1: [0,10]
      (1L, 10L, 20L),  //   touches 10 → merges
      (1L, 12L, 14L),  //   contained → merges, extends nothing
      (1L, 21L, 30L),  // island 2: strict gap (21 > 20)
      (1L, 5L, 25L),   //   wait — [5,25] bridges islands 1 and 2!
      (2L, 0L, 1L))    // other key
      .toDF("k", "s", "e")
    withPartitionings(df) { d =>
      val out = rows(Events.mergeIntervals(d, Seq("k"), "s", "e")
        .orderBy("k", "s"))
      // [5,25] makes key 1 ONE island [0,30] of 5 intervals
      assert(out == Seq(Seq(1L, 0L, 30L, 5L), Seq(2L, 0L, 1L, 1L)))
    }
  }

  test("mergeIntervals: running-max matters — an early long interval " +
    "covers later short ones") {
    // [0,100] then [10,20], [30,40]: naive lag(e) would see 20 < 30 and
    // split; the running MAX(e) correctly keeps one island.
    val df = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L),
      (1L, 101L, 110L)).toDF("k", "s", "e")
    val out = rows(Events.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("k", "s"))
    assert(out == Seq(Seq(1L, 0L, 100L, 3L), Seq(1L, 101L, 110L, 1L)))
  }

  test("transitions: adjacent pairs per key, last event contributes none") {
    val df = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "buy"),
      (2L, 4L, "view"), (2L, 5L, "view"),
      (3L, 6L, "buy")) // single event: no transition
      .toDF("u", "id", "tp")
      .select(col("u"), col("id"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"), col("tp"))
    // all ts equal → order falls entirely to the tie column (id)
    withPartitionings(df) { d =>
      val out = rows(Events.transitions(d, Seq("u"), "ts", "tp", "id")
        .orderBy("from_type", "to_type"))
      assert(out == Seq(Seq("click", "buy", 1L), Seq("view", "click", 1L),
        Seq("view", "view", 1L)))
    }
  }

  test("burstLeaders: gap from PREVIOUS event, not last kept leader") {
    // Chain t=0,30m,60m,90m: every gap is 30m <= 1h, so the whole chain is
    // ONE burst even though t=90m is >1h after the t=0 leader — the
    // gaps-and-islands semantics this operator documents.
    val df = Seq(
      (1L, 10L, "a", "2024-01-01 10:00:00"),
      (2L, 10L, "a", "2024-01-01 10:30:00"),
      (3L, 10L, "a", "2024-01-01 11:00:00"),
      (4L, 10L, "a", "2024-01-01 11:30:00"),
      (5L, 10L, "a", "2024-01-01 13:00:00"), // 90m gap > 1h: new burst
      (6L, 10L, "b", "2024-01-01 10:05:00"), // different key: own burst
      (7L, 11L, "a", "2024-01-01 10:05:00"))
      .toDF("id", "u", "tp", "t")
      .select(col("id"), col("u"), col("tp"), to_timestamp(col("t")).as("ts"))
    withPartitionings(df) { d =>
      val out = rows(Events.burstLeaders(d, Seq("u", "tp"), "ts",
        gapSeconds = 3600L, tieCol = "id").select("id").orderBy("id"))
      assert(out == Seq(Seq(1L), Seq(5L), Seq(6L), Seq(7L)))
    }
  }

  test("burstLeaders: gap EXACTLY at threshold does not break the burst") {
    val df = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 1L, "a", "2024-01-01 11:00:00"),  // exactly 3600s: same burst
      (3L, 1L, "a", "2024-01-01 12:00:01"))  // 3601s: leader
      .toDF("id", "u", "tp", "t")
      .select(col("id"), col("u"), col("tp"), to_timestamp(col("t")).as("ts"))
    val out = rows(Events.burstLeaders(df, Seq("u", "tp"), "ts", 3600L, "id")
      .select("id").orderBy("id"))
    assert(out == Seq(Seq(1L), Seq(3L)))
  }

  test("burstLeaders: simultaneous events pick the smallest tie id as leader") {
    val df = Seq(
      (9L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 1L, "a", "2024-01-01 10:00:00"))
      .toDF("id", "u", "tp", "t")
      .select(col("id"), col("u"), col("tp"), to_timestamp(col("t")).as("ts"))
    val out = rows(Events.burstLeaders(df, Seq("u", "tp"), "ts", 60L, "id")
      .select("id"))
    assert(out == Seq(Seq(2L)))
  }

  test("longestStreak: islands, tie-break to earliest, multi-event days") {
    val days = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6), (1L, 6),
      (2L, 7), (2L, 9), (2L, 10)) // u1: runs 3+2; u2: runs 1+2
    val df = days.map { case (u, dd) => (u, f"2024-01-$dd%02d 08:00:00") }
      .toDF("u", "t").select(col("u"), to_timestamp(col("t")).as("ts"))
    val out = rows(Events.longestStreak(df, "u", "ts").orderBy("u"))
      .map(r => (r.head, r(1), r(2), r(3), r(4).toString))
    assert(out == Seq((1L, 5L, 2L, 3L, "2024-01-01"),
      (2L, 3L, 2L, 2L, "2024-01-09")))
    // equal-length runs: earliest start wins
    val tied = Seq((3L, 1), (3L, 2), (3L, 4), (3L, 5))
      .map { case (u, dd) => (u, f"2024-01-$dd%02d 08:00:00") }
      .toDF("u", "t").select(col("u"), to_timestamp(col("t")).as("ts"))
    assert(rows(Events.longestStreak(tied, "u", "ts")).head(4).toString ==
      "2024-01-01")
  }

  test("typeNgrams: adjacent trigrams with distinct-key support") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .map { case (u, i, tp) => (u, f"2024-01-01 10:0$i%d:00", tp, i) }
      .toDF("u", "t", "tp", "id")
      .select(col("u"), to_timestamp(col("t")).as("ts"), col("tp"), col("id"))
    val out = rows(Events.typeNgrams(df, Seq("u"), "ts", "tp", "id", 3)
      .orderBy("ngram"))
    assert(out == Seq(Seq("a>b>c", 2L, 2L), Seq("b>c>d", 1L, 1L)))
  }

  test("activeUserStats: coverage windows equal brute-force rolling distincts") {
    val acts = Seq((1L, 1), (1L, 2), (2L, 2), (3L, 5), (1L, 9), (2L, 9))
    val df = acts.map { case (u, day) =>
      (u, f"2024-01-$day%02d 12:00:00")
    }.toDF("u", "t").select(col("u"), to_timestamp(col("t")).as("ts"))
    val out = rows(Events.activeUserStats(df, "u", "ts", wauDays = 3,
      mauDays = 7).orderBy("day"))
    val days = acts.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = acts.filter(_._2 == d).map(_._1).distinct.size.toLong
      val wau = acts.filter(a => a._2 > d - 3 && a._2 <= d)
        .map(_._1).distinct.size.toLong
      val mau = acts.filter(a => a._2 > d - 7 && a._2 <= d)
        .map(_._1).distinct.size.toLong
      (dau, wau, mau)
    }
    assert(out.map(r => (r(1), r(2), r(3))) == expected)
    // stickiness on the last day: dau 2 / mau 3, rounded 6 dp
    assert(out.last(4) == 0.666667)
  }

  test("overlapDuration: hand-computed overlaps; half-open touch is no pair") {
    import spark.implicits._
    val a = Seq(("k", 0L, 100L), ("k", 200L, 250L), ("z", 0L, 10L))
      .toDF("k", "s", "e")
    val b = Seq(("k", 50L, 120L), ("k", 100L, 150L), ("k", 240L, 300L))
      .toDF("k", "s", "e")
    withPartitionings(a) { aa =>
      val out = rows(Events.overlapDuration(aa, b, "k", "s", "e",
        bucketWidth = 64L).orderBy("key"))
      // [0,100)∩[50,120) = 50; [0,100)∩[100,150) = 0 (touch — no pair);
      // [200,250)∩[240,300) = 10; z has no b rows.
      assert(out == Seq(Seq("k", 2L, 60L)))
    }
  }

  test("overlapDuration: equals the brute-force quadratic join") {
    import spark.implicits._
    val av = (0 until 40).map(i => ("g", (i * 53 % 500).toLong,
      (i * 53 % 500 + 1 + i % 60).toLong))
    val bv = (0 until 40).map(i => ("g", (i * 37 % 500).toLong,
      (i * 37 % 500 + 1 + i % 45).toLong))
    val out = rows(Events.overlapDuration(av.toDF("k", "s", "e"),
      bv.toDF("k", "s", "e"), "k", "s", "e", bucketWidth = 100L)).head
    val ovs = for { x <- av; y <- bv }
      yield math.max(0L, math.min(x._3, y._3) - math.max(x._2, y._2))
    assert(out == Seq("g", ovs.count(_ > 0).toLong, ovs.sum))
  }

  test("overlapDuration: span guard fires on an interval wider than the cap") {
    import spark.implicits._
    val a = Seq(("k", 0L, 10000L)).toDF("k", "s", "e")
    val b = Seq(("k", 0L, 1L)).toDF("k", "s", "e")
    val ex = intercept[Exception] {
      Events.overlapDuration(a, b, "k", "s", "e", bucketWidth = 10L,
        maxSpanBuckets = 8).collect()
    }
    assert(ex.getMessage.contains("overlapDuration") ||
      ex.getCause != null)
  }

  test("positionAttribution: 40/20/40 with middle remainder, degenerate paths") {
    // user 1: four touches -> 400k, 100k+remainder, 100k, 400k
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "view", 1L),
      (1L, "2024-01-02 00:00:00", "click", 2L),
      (1L, "2024-01-03 00:00:00", "view", 3L),
      (1L, "2024-01-04 00:00:00", "click", 4L),
      (1L, "2024-01-05 00:00:00", "purchase", 5L),
      (2L, "2024-01-01 00:00:00", "view", 6L),   // single touch -> 10^6
      (2L, "2024-01-02 00:00:00", "purchase", 7L),
      (3L, "2024-01-01 00:00:00", "view", 8L),   // two touches -> 500k each
      (3L, "2024-01-02 00:00:00", "click", 9L),
      (3L, "2024-01-03 00:00:00", "purchase", 10L)
    ).toDF("u", "t", "tp", "id").select(col("u"),
      to_timestamp(col("t")).as("ts"), col("tp"), col("id"))
    val out = rows(Events.positionAttribution(df, "u", "ts", "tp", "id",
      Seq("view", "click"), "purchase").orderBy("u", "id"))
      .map(r => (r(0), r(1), r(4)))
    assert(out == Seq(
      (1L, 1L, 400000L), (1L, 2L, 100000L), (1L, 3L, 100000L), (1L, 4L, 400000L),
      (2L, 6L, 1000000L),
      (3L, 8L, 500000L), (3L, 9L, 500000L)))
    // 200000 div 2 = 100000, remainder 0 here; check a 5-touch path for
    // a REAL remainder: 200000 div 3 = 66666 r 2
    val df5 = (1 to 5).map(i => (9L, f"2024-01-0$i 00:00:00", "view", i.toLong)) :+
      ((9L, "2024-01-06 00:00:00", "purchase", 9L))
    val out5 = rows(Events.positionAttribution(df5.toDF("u", "t", "tp", "id")
      .select(col("u"), to_timestamp(col("t")).as("ts"), col("tp"), col("id")),
      "u", "ts", "tp", "id", Seq("view"), "purchase").orderBy("id"))
      .map(_(4).asInstanceOf[Long])
    assert(out5 == Seq(400000L, 66668L, 66666L, 66666L, 400000L))
    assert(out5.sum == 1000000L)
  }

  test("timeDecayAttribution: exact halving weights, remainder to earliest") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "view", 1L),  // age 2 days -> w = 2^28
      (1L, "2024-01-02 00:00:00", "view", 2L),  // age 1 day  -> w = 2^29
      (1L, "2024-01-03 00:00:00", "purchase", 3L)
    ).toDF("u", "t", "tp", "id").select(col("u"),
      to_timestamp(col("t")).as("ts"), col("tp"), col("id"))
    val out = rows(Events.timeDecayAttribution(df, "u", "ts", "tp", "id",
      Seq("view"), "purchase").orderBy("id"))
    assert(out.map(_(4)) == Seq(1L << 28, 1L << 29))
    val credits = out.map(_(5).asInstanceOf[Long])
    // shares 1/3 and 2/3 of a million, floors 333333+666666, remainder 1
    // to the EARLIEST touch
    assert(credits == Seq(333334L, 666666L))
    assert(credits.sum == 1000000L)
  }

  test("subsequenceCount counts every index-increasing triple") {
    // types: A A B B C -> ab pairs at B1=2, B2=2; triples at C = 4
    val df = Seq("view", "view", "click", "click", "purchase")
      .zipWithIndex.map { case (tp, i) =>
        (7L, f"2024-01-0${i + 1} 00:00:00", tp, i.toLong) }
      .toDF("u", "t", "tp", "id").select(col("u"),
        to_timestamp(col("t")).as("ts"), col("tp"), col("id"))
    val out = rows(Events.subsequenceCount(df, "u", "ts", "id", "tp",
      ("view", "click", "purchase")))
    assert(out == Seq(Seq(7L, 5L, 4L)))
    // order matters: C before all others contributes nothing
    val df2 = Seq("purchase", "view", "click").zipWithIndex.map { case (tp, i) =>
      (8L, f"2024-01-0${i + 1} 00:00:00", tp, i.toLong) }
      .toDF("u", "t", "tp", "id").select(col("u"),
        to_timestamp(col("t")).as("ts"), col("tp"), col("id"))
    assert(rows(Events.subsequenceCount(df2, "u", "ts", "id", "tp",
      ("view", "click", "purchase"))).head(2) == 0L)
  }

  test("cohortValueCurves: cumulative revenue per cohort user") {
    // one cohort (week of Jan 1 2024), two users; revenue 10+20 week 0,
    // 5 week 1 (one active user); a second cohort starts week 1
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 10.0), (2L, "2024-01-02 10:00:00", 20.0),
      (1L, "2024-01-08 10:00:00", 5.0),
      (3L, "2024-01-09 10:00:00", 7.0)
    ).toDF("u", "t", "v").select(col("u"),
      to_timestamp(col("t")).as("ts"), col("v"))
    val out = rows(Events.cohortValueCurves(df, "u", "ts", "v")
      .orderBy("cohort", "offset"))
    assert(out.size == 3)
    val c0w0 = out(0)
    assert(c0w0(2) == 2L && c0w0(3) == 2L)       // both users, size 2
    assert(c0w0(4) == 30.0 && c0w0(5) == 30.0)   // period = cum at offset 0
    assert(c0w0(6) == 15.0)
    val c0w1 = out(1)
    assert(c0w1(1) == 1L && c0w1(2) == 1L)       // offset 1, one active
    assert(c0w1(4) == 5.0 && c0w1(5) == 35.0 && c0w1(6) == 17.5)
    val c1w0 = out(2)
    assert(c1w0(3) == 1L && c1w0(5) == 7.0 && c1w0(6) == 7.0)
  }
}
