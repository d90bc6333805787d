package graft.pipeline

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Calendar dimension, 2-D skyline, and table fingerprints. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dateDimension: leap day, ISO dow, month boundaries") {
    val out = rows(Relational.dateDimension(spark, "2024-02-28", "2024-03-02")
      .select("date", "isodow", "is_weekend", "is_month_start", "is_month_end"))
    // 2024-02-29 exists (leap year); 2024-02-28 is a Wednesday (isodow
    // 3) and 2024-03-02 a Saturday (isodow 6)
    assert(out == Seq(
      Seq("2024-02-28", 3, false, false, false),
      Seq("2024-02-29", 4, false, false, true),
      Seq("2024-03-01", 5, false, true, false),
      Seq("2024-03-02", 6, true, false, false)), s"got $out")
  }

  test("skyline2d: dominance, per-x ties, duplicate frontier points") {
    // (5,1) and (1,5) are the frontier; (3,3) is NOT dominated either;
    // (2,2) dominated by (3,3); (5,0) dominated by (5,1) (tie on x,
    // strictly lower y); the duplicate (3,3) survives twice.
    val df = Seq((1, 5.0, 1.0), (2, 1.0, 5.0), (3, 3.0, 3.0), (4, 3.0, 3.0),
      (5, 2.0, 2.0), (6, 5.0, 0.0)).toDF("id", "x", "y")
    withPartitionings(df) { d =>
      val out = rows(Profile.skyline2d(d, "x", "y").orderBy("id").select("id"))
        .map(_.head)
      assert(out == Seq(1, 2, 3, 4), s"got $out")
    }
  }

  test("skyline2d: NULL coordinates excluded; single point survives") {
    val df = Seq((1, Some(1.0), Some(1.0)), (2, None, Some(9.0)),
      (3, Some(9.0), None)).toDF("id", "x", "y")
    val out = rows(Profile.skyline2d(df, "x", "y").select("id")).map(_.head)
    assert(out == Seq(1), s"got $out")
  }

  test("tableFingerprint: order/partition independent, perturbation-sensitive, NULL-safe") {
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, None)).toDF("k", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      rows(Checks.tableFingerprint(df, Seq("k", "v"))).head
    val b = fp(base)
    assert(b == fp(base.orderBy(desc("k")).repartition(5)),
      "reordering must not change the fingerprint")
    assert(b != fp(base.withColumn("v",
      when(col("k") === 1, "A").otherwise(col("v")))),
      "a changed value must change the fingerprint")
    assert(b != fp(base.limit(2).union(base.limit(2))),
      "different multiset must change the fingerprint")
    assert(b(0) == 3L)
  }

  test("bandJoin: half-open boundaries, overlap duplicates, BNLJ plan") {
    val facts = Seq((1L, 10.0), (2L, 50.0), (3L, 49.999), (4L, 200.0))
      .toDF("id", "v")
    val bands = Seq(("a", 0L, 50L), ("b", 50L, 100L), ("wide", 0L, 100L))
      .toDF("band", "lo", "hi")
    val out = Relational.bandJoin(facts, bands, "v", "lo", "hi")
    val got = rows(out.select("id", "band").orderBy("id", "band"))
    // 50.0 lands in b not a (half-open); 200 matches nothing; the
    // overlapping 'wide' band duplicates rows by design
    assert(got == Seq(Seq(1L, "a"), Seq(1L, "wide"), Seq(2L, "b"),
      Seq(2L, "wide"), Seq(3L, "a"), Seq(3L, "wide")))
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "band table must broadcast, fact side must not exchange")
  }

  test("reconcile: match, mismatch, and one-sided keys") {
    val l = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0), (4L, 1.0))
      .toDF("k", "v")
    val r = Seq((1L, 15.0), (2L, 7.5), (3L, 9.0)).toDF("k", "w")
    withPartitionings(l) { ld =>
      val out = rows(Checks.reconcile(ld, r, Seq("k"), "v", "w",
        BigDecimal("0.25")).orderBy("k"))
      assert(out.map(r => (r.head, r.last)) == Seq((1L, "match"),
        (2L, "mismatch"), (3L, "right_only"), (4L, "left_only")))
      assert(out(1)(5) == -0.5) // diff column is l − r
      assert(out(2)(1) == 0L && out(2)(3) == null)
    }
  }

  test("notInSubquery: full three-valued NOT IN semantics") {
    val df = Seq(Some(1L), Some(2L), Some(3L), None).toDF("v")
    val clean = Seq(2L).toDF("s")
    // plain case: 2 removed, NULL x removed (unknown), 1 and 3 kept
    assert(rows(Relational.notInSubquery(df, "v", clean, "s")
      .orderBy("v")).map(_.head) == Seq(1L, 3L))
    // one NULL in the subquery: nothing qualifies
    val withNull = Seq(Some(2L), None).toDF("s")
    assert(rows(Relational.notInSubquery(df, "v", withNull, "s")).isEmpty)
    // empty subquery: vacuous truth keeps EVERYTHING, including NULL x
    val empty = Seq.empty[Option[Long]].toDF("s")
    assert(rows(Relational.notInSubquery(df, "v", empty, "s")).size == 4)
  }

  test("inclusionDependency: containment fractions and NULL handling") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None).toDF("v")
    val parent = Seq(1L, 2L, 9L).toDF("p")
    val out = rows(Checks.inclusionDependency(child, "v", parent, "p")).head
    // distinct non-NULL child {1,2,3}: 3 missing 1 → containment 2/3
    assert(out == Seq(3L, 1L, 0.666667))
    val empty = Seq.empty[Option[Long]].toDF("v")
    assert(rows(Checks.inclusionDependency(empty, "v", parent, "p")).head ==
      Seq(0L, 0L, null))
  }

  test("trimmedMean: boundary values keep partial multiplicity") {
    // values: 1×1, 2×4, 9×4, 10×1 (n=10); trim 2/10 → t=2:
    // keep ranks 3..8 = {2,2,2,9,9,9} → mean 5.5
    val df = (Seq(1.0, 10.0) ++ Seq.fill(4)(2.0) ++ Seq.fill(4)(9.0))
      .map(("g", _)).toDF("g", "v")
    withPartitionings(df) { d =>
      val out = rows(Profile.trimmedMean(d, "g", "v", 2, 10)).head
      assert(out == Seq("g", 10L, 2L, 6L, 5.5))
    }
    // trimming everything → NULL mean
    val tiny = Seq(("g", 1.0), ("g", 2.0)).toDF("g", "v")
    assert(rows(Profile.trimmedMean(tiny, "g", "v", 4, 10)).head.last != null)
    intercept[IllegalArgumentException] {
      Profile.trimmedMean(tiny, "g", "v", 5, 10)
    }
  }

  test("rebalanceClasses: every class capped at the smallest; deterministic") {
    val df = (1L to 10L).map(i => (i, "big")) ++ Seq((11L, "small"), (12L, "small"))
    val d2 = df.toDF("id", "lab")
    withPartitionings(d2) { d =>
      val out = Sampling.rebalanceClasses(d, "lab", Seq("id"))
      val counts = rows(out.groupBy("lab").count().orderBy("lab"))
      assert(counts == Seq(Seq("big", 2L), Seq("small", 2L)))
    }
    // 2:1 ratio keeps up to 4 of the majority
    val r2 = Sampling.rebalanceClasses(d2, "lab", Seq("id"), 2, 1)
    assert(rows(r2.groupBy("lab").count().orderBy("lab")) ==
      Seq(Seq("big", 4L), Seq("small", 2L)))
  }

  test("tukeyFences: nearest-rank quartiles and the outlier tally") {
    val df = ((1 to 7).map(v => ("g", v.toDouble)) :+ ("g", 100.0))
      .toDF("g", "v")
    val out = rows(Profile.tukeyFences(df, "g", "v")).head
    // sorted [1..7,100]: q1 = rank ceil(8/4)=2 → 2; q3 = rank 6 → 6;
    // fences [−4, 12] → one outlier (100)
    assert(out == Seq("g", 8L, 2.0, 6.0, -4.0, 12.0, 1L))
  }
}
