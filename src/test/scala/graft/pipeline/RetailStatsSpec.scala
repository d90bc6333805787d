package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retail segmentation (RFM, ABC) and the two rank tests (Mann-Whitney U,
  * Kolmogorov-Smirnov) on hand-computed fixtures. */
class RetailStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rfm: recency days, scores and segment on a hand-built order log") {
    // three customers: 1 orders on day 0 and day 10, 2 on day 10, 3 on day 5
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    val orders = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 50.0),
      (2L, ts(10), 400.0),
      (3L, ts(5), 200.0)
    ).toDF("cust", "ots", "amt")
    val out = rows(Retail.rfm(orders, "cust", "ots", "amt", k = 3)
      .orderBy("cust")
      .selectExpr("cust", "r_days", "frequency",
        "cast(monetary as double)", "r_score", "f_score", "m_score", "segment"))
    // ref date = day 10. r_days: c1=0, c2=0, c3=5. freq: c1=2, c2=1, c3=1.
    // monetary: c1=150, c2=400, c3=200.
    // r ntile(3) over (r_days, cust): c1→1, c2→2, c3→3
    // f ntile(3) over (freq desc, cust): c1→1, c2→2, c3→3
    // m ntile(3) over (monetary desc, cust): c2→1, c3→2, c1→3
    assert(out == Seq(
      Seq(1L, 0L, 2L, 150.0, 1, 1, 3, 113),
      Seq(2L, 0L, 1L, 400.0, 2, 2, 1, 221),
      Seq(3L, 5L, 1L, 200.0, 3, 3, 2, 332)), s"got $out")
  }

  test("abcClassify: exact cut-line boundaries, revenue ties broken by key") {
    // revenues 50, 30, 15, 5 → cumulative shares 50%, 80%, 95%, 100%:
    // the 80% and 95% rows sit EXACTLY on the cut lines and must be A/B.
    val df = Seq(("a", 50), ("b", 30), ("c", 15), ("d", 5))
      .toDF("k", "amt")
    val out = rows(Retail.abcClassify(df, "k", "amt")
      .orderBy("k").selectExpr("k", "abc_class"))
    assert(out == Seq(Seq("a", "A"), Seq("b", "A"), Seq("c", "B"), Seq("d", "C")),
      s"got $out")
  }

  test("mannWhitneyU: tie-aware 2U matches the hand calculation") {
    // arm A: 1, 2, 2; arm B: 2, 3. Ranks: 1→1; three 2s share (2+3+4)/3=3;
    // 3→5. R1 = 1 + 3 + 3 = 7 → 2R1 = 14; 2U1 = 14 − 2·n1(n1+1)/2 = 14 − 12 = 2.
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("g", "v")
    withPartitionings(df) { d =>
      val out = rows(Profile.mannWhitneyU(d, "g", "v", "A", "B")
        .select("n1", "n2", "two_u"))
      assert(out == Seq(Seq(3L, 2L, 2L)), s"got $out")
    }
  }

  test("ksTest2: exact integer D numerator on a stepped fixture") {
    // A: 1,2,3 (n1=3); B: 3,4 (n2=2).
    // at v=1: |2·1 − 3·0| = 2; v=2: |2·2 − 3·0| = 4; v=3: |2·3 − 3·1| = 3;
    // v=4: |2·3 − 3·2| = 0 → d_num = 4, d = 4/6.
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    withPartitionings(df) { d =>
      val out = rows(Profile.ksTest2(d, "g", "v", "A", "B"))
      assert(out == Seq(Seq(3L, 2L, 4L, 0.666667)), s"got $out")
    }
  }

  test("rank tests ignore NULL values and other arms") {
    val df = Seq(("A", Some(1.0)), ("A", None), ("B", Some(2.0)),
      ("C", Some(99.0))).toDF("g", "v")
    val mw = rows(Profile.mannWhitneyU(df, "g", "v", "A", "B")
      .select("n1", "n2", "two_u"))
    // single 1 vs single 2: R1 = 1, 2R1 = 2, 2U = 2 − 2 = 0
    assert(mw == Seq(Seq(1L, 1L, 0L)), s"got $mw")
    val ks = rows(Profile.ksTest2(df, "g", "v", "A", "B"))
    assert(ks == Seq(Seq(1L, 1L, 1L, 1.0)), s"got $ks")
  }
}
