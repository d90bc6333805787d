package graft.operators

import graft.SparkSpec
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._

/** Aggregation semantics from the reference (column_aggregator.h:37-42):
  * all aggregations ignore NULLs; empty/all-NULL group → NULL except
  * COUNT → 0; ScalarAggregate returns exactly one row on empty input.
  */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq(
    ("a", Some(1)), ("a", Some(3)), ("a", None),
    ("b", None), ("b", None),
    ("c", Some(7))
  ).toDF("k", "v")

  test("groupAggregate: nulls ignored; all-null group sums to NULL, counts 0") {
    withPartitionings(data) { df =>
      val out = groupAggregate(Seq("k"), Seq(
        Agg(SUM, Some("v"), "s"),
        Agg(COUNT, Some("v"), "c"),
        Agg(COUNT, None, "n"),
        Agg(MIN, Some("v"), "mn"),
        Agg(MAX, Some("v"), "mx")))(df).orderBy("k")
      assert(rows(out) == Seq(
        Seq("a", 4L, 2L, 3L, 1, 3),
        Seq("b", null, 0L, 2L, null, null),
        Seq("c", 7L, 1L, 1L, 7, 7)))
    }
  }

  test("groupAggregate: empty input yields zero rows") {
    val out = groupAggregate(Seq("k"), Seq(Agg(COUNT, None, "n")))(
      data.filter(lit(false)))
    assert(out.count() == 0)
  }

  test("scalarAggregate: exactly one row even on empty input") {
    val out = scalarAggregate(Seq(
      Agg(COUNT, None, "n"), Agg(SUM, Some("v"), "s")))(data.filter(lit(false)))
    assert(rows(out) == Seq(Seq(0L, null)))
  }

  test("DISTINCT variants") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2)).toDF("k", "v")
    val out = groupAggregate(Seq("k"), Seq(
      Agg(SUM, Some("v"), "sd", distinct = true),
      Agg(COUNT, Some("v"), "cd", distinct = true)))(df).orderBy("k")
    assert(rows(out) == Seq(Seq("a", 3L, 2L), Seq("b", 2L, 1L)))
  }

  test("CONCAT aggregates in explicit order with separator, skipping NULLs") {
    val df = Seq((1, Some("x")), (3, Some("z")), (2, Some("y")), (4, None))
      .toDF("ord", "s")
    withPartitionings(df) { d =>
      val out = scalarAggregate(Seq(
        Agg(CONCAT, Some("s"), "cat", order = Some(col("ord")))))(d)
      assert(rows(out).head.head == "x,y,z")
    }
  }

  test("CONCAT DISTINCT dedupes values, keeping first occurrence in order") {
    val df = Seq((1, "x"), (2, "y"), (3, "x"), (4, "z")).toDF("ord", "s")
    withPartitionings(df) { d =>
      val out = scalarAggregate(Seq(
        Agg(CONCAT, Some("s"), "cat", distinct = true, order = Some(col("ord")))))(d)
      assert(rows(out).head.head == "x,y,z")
    }
  }

  test("FIRST/LAST take explicit order and ignore NULLs") {
    val df = Seq((1, None), (2, Some("b")), (3, Some("c")), (4, None))
      .toDF("ord", "s")
    withPartitionings(df) { d =>
      val out = scalarAggregate(Seq(
        Agg(FIRST, Some("s"), "f", order = Some(col("ord"))),
        Agg(LAST, Some("s"), "l", order = Some(col("ord")))))(d)
      assert(rows(out).head == Seq("b", "c"))
    }
  }

  test("explicit output type override") {
    val df = Seq(1, 2).toDF("v")
    val out = scalarAggregate(Seq(
      Agg(SUM, Some("v"), "s", outType = Some(org.apache.spark.sql.types.DoubleType))))(df)
    assert(rows(out).head.head == 3.0)
  }

  test("groupAggregateWithLimit: first K keys individual, rest in overflow row") {
    val df = Seq(("a", 1), ("b", 2), ("c", 4), ("d", 8), ("c", 16)).toDF("k", "v")
    val out = groupAggregateWithLimit("k", Seq(
      Agg(SUM, Some("v"), "s"), Agg(COUNT, None, "n")), limit = 2)(df)
      .orderBy(col("k").asc_nulls_last, col("overflow"))
    assert(rows(out) == Seq(
      Seq("a", false, 1L, 1L), Seq("b", false, 2L, 1L), Seq(null, true, 28L, 3L)))
  }

  test("groupAggregateWithLimit: kept NULL-key group stays distinct from overflow row") {
    // the overflow marker keeps the reference's two-row output: a genuine
    // NULL-key group (kept: NULL sorts first) and the overflow group are
    // separate rows, distinguished by `overflow`
    val df = Seq((None, 1), (Some("a"), 2), (Some("b"), 4), (Some("c"), 8))
      .toDF("k", "v")
    val out = groupAggregateWithLimit("k", Seq(
      Agg(SUM, Some("v"), "s"), Agg(COUNT, None, "n")), limit = 2)(df)
      .orderBy(col("k").asc_nulls_last, col("overflow"))
    // kept: NULL and "a"; overflow: b+c in its own marked row
    assert(rows(out) == Seq(
      Seq("a", false, 2L, 1L), Seq(null, false, 1L, 1L), Seq(null, true, 12L, 2L)))
  }

  test("rollupAggregate: hierarchical subtotals with grouping-id bit order") {
    // first key = most significant bit (ANSI GROUPING convention)
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 4)).toDF("k1", "k2", "v")
    withPartitionings(df) { d =>
      val out = rollupAggregate(Seq("k1", "k2"), Seq(Agg(SUM, Some("v"), "s")))(d)
        .orderBy(col("gid"), col("k1"), col("k2"))
      assert(rows(out) == Seq(
        Seq("a", "x", 0L, 1L), Seq("a", "y", 0L, 2L), Seq("b", "x", 0L, 4L),
        Seq("a", null, 1L, 3L), Seq("b", null, 1L, 4L),
        Seq(null, null, 3L, 7L)))
    }
  }

  test("rollupAggregate: gid disambiguates a real NULL key from a subtotal") {
    val df = Seq((Some("a"), 1), (None, 2)).toDF("k", "v")
    val out = rollupAggregate(Seq("k"), Seq(Agg(SUM, Some("v"), "s")))(df)
      .orderBy(col("gid"), col("k"))
    // NULL-key real group (gid 0) vs grand total (gid 1) — distinct rows
    assert(rows(out) == Seq(
      Seq(null, 0L, 2L), Seq("a", 0L, 1L), Seq(null, 1L, 3L)))
  }

  test("cubeAggregate: all 2^n grouping sets") {
    val df = Seq(("a", "x", 1), ("b", "y", 2)).toDF("k1", "k2", "v")
    val out = cubeAggregate(Seq("k1", "k2"), Seq(Agg(COUNT, None, "n")))(df)
    assert(out.count() == 2 + 2 + 2 + 1) // (k1,k2) pairs, k1 only, k2 only, total
    assert(rows(out.where(col("gid") === 3))== Seq(Seq(null, null, 3L, 2L)))
  }

  test("groupingSetsAggregate: explicit sets only") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 4)).toDF("k1", "k2", "v")
    val out = groupingSetsAggregate(
      Seq(Seq("k1"), Seq.empty), Seq("k1", "k2"),
      Seq(Agg(SUM, Some("v"), "s")))(df).orderBy(col("gid"), col("k1"))
    // per-k1 subtotals (k2 aggregated ⇒ bit 0 set ⇒ gid 1) + grand total
    assert(rows(out) == Seq(Seq("a", null, 1L, 3L), Seq("b", null, 1L, 4L),
      Seq(null, null, 3L, 7L)))
  }

  test("pivotAggregate: explicit value list, absent combinations NULL") {
    val df = Seq(("p1", "O", 10), ("p1", "F", 5), ("p2", "O", 7)).toDF("k", "st", "v")
    withPartitionings(df) { d =>
      val out = pivotAggregate(Seq("k"), "st", Seq("O", "F"),
        Agg(SUM, Some("v"), "s"))(d).orderBy("k")
      assert(out.columns.toSeq == Seq("k", "O", "F"))
      assert(rows(out) == Seq(Seq("p1", 10L, 5L), Seq("p2", 7L, null)))
    }
  }

  test("unpivot: wide to long, one Expand, no union/extra scans") {
    val df = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("k", "x", "y")
    withPartitionings(df) { d =>
      val out = unpivot(d, Seq("k"), Seq("x", "y"), "metric", "value")
      assert(out.columns.toSeq == Seq("k", "metric", "value"))
      assert(rows(out.orderBy("k", "metric")) == Seq(
        Seq("a", "x", 1L), Seq("a", "y", 10L),
        Seq("b", "x", 2L), Seq("b", "y", 20L)))
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"expected one Expand node:\n$plan")
      assert(!plan.contains("Union"), "unpivot must not plan a UNION of scans")
    }
  }

  test("ARG_MAX/ARG_MIN: deterministic tie-break, NULLs ignored") {
    // dept a: amt ties at 9 for ids 3 and 7 → ARG_MAX must pick 7 (larger
    // value wins the tie) REGARDLESS of partitioning; bare max_by would
    // return whichever arrives last.
    val df = Seq(("a", 3L, Some(9)), ("a", 7L, Some(9)), ("a", 1L, Some(2)),
      ("b", 5L, Some(4)), ("b", 6L, None), // NULL order key ignored
      ("c", 8L, Some(1))).toDF("dept", "id", "amt")
    withPartitionings(df) { d =>
      val out = rows(groupAggregate(Seq("dept"), Seq(
        Agg(ARG_MAX, Some("id"), "hi", order = Some(col("amt"))),
        Agg(ARG_MIN, Some("id"), "lo", order = Some(col("amt")))))(d)
        .orderBy("dept"))
      assert(out == Seq(Seq("a", 7L, 1L), Seq("b", 5L, 5L), Seq("c", 8L, 8L)))
    }
  }

  test("ARG_MAX: all order keys NULL yields NULL; missing order errors") {
    val df = Seq(("a", 1L, None: Option[Int])).toDF("dept", "id", "amt")
    val out = rows(groupAggregate(Seq("dept"), Seq(
      Agg(ARG_MAX, Some("id"), "hi", order = Some(col("amt")))))(df))
    assert(out == Seq(Seq("a", null)))
    intercept[RuntimeException] {
      Agg(ARG_MAX, Some("id"), "hi").toColumn
    }
  }

  test("unpivot: null measure values survive as null rows") {
    val df = Seq(("a", Some(1L), None: Option[Long])).toDF("k", "x", "y")
    val out = rows(unpivot(df, Seq("k"), Seq("x", "y"), "m", "v").orderBy("m"))
    assert(out == Seq(Seq("a", "x", 1L), Seq("a", "y", null)))
  }
}
