package graft.pipeline

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Point-in-time joins, Fellegi-Sunter linkage weights, and the Benford
  * digit extraction. */
class LinkagePitSpec extends SparkSpec {
  import spark.implicits._

  test("pointInTimeJoin: validity windows, deleted gap, open tail") {
    // key 1: v[1,3) price 10, deleted at 3, re-opened [5,∞) price 30
    val log = Seq(
      (1L, 10.0, 1L, "I"), (1L, 0.0, 3L, "D"), (1L, 30.0, 5L, "I"),
      (2L, 99.0, 2L, "I")
    ).toDF("k", "price", "seq", "op")
    val hist = Relational.scd2History(log, Seq("k"), "seq", "op")
      .withColumnRenamed("price", "dim_price")
    val facts = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 7L),
      (2L, 1L), (2L, 2L)).toDF("k", "fact_seq")
    withPartitionings(facts) { f =>
      val out = rows(Relational.pointInTimeJoin(f, hist, Seq("k"), "fact_seq")
        .orderBy("k", "fact_seq").select("k", "fact_seq", "dim_price"))
      assert(out == Seq(
        Seq(1L, 1L, 10.0), Seq(1L, 2L, 10.0), Seq(1L, 3L, null),
        Seq(1L, 4L, null), Seq(1L, 7L, 30.0),
        Seq(2L, 1L, null), Seq(2L, 2L, 99.0)), s"got $out")
      // SCD2 non-overlap ⇒ join never multiplies facts
      assert(Relational.pointInTimeJoin(f, hist, Seq("k"), "fact_seq").count() ==
        f.count(), "PIT join must keep exactly one row per fact")
    }
  }

  test("pointInTimeJoin rejects colliding payload columns") {
    val hist = Seq((1L, 5.0, 1L)).toDF("k", "v", "valid_from")
      .withColumn("valid_to", lit(null).cast("long"))
    val facts = Seq((1L, 1L, 9.0)).toDF("k", "fact_seq", "v")
    intercept[IllegalArgumentException] {
      Relational.pointInTimeJoin(facts, hist, Seq("k"), "fact_seq")
    }
  }

  test("linkageScores: weights match the hand-rounded constants") {
    val l = Seq((1, 10L, "ann", "x")).toDF("b", "id", "name", "seg")
    val r = Seq((1, 20L, "ann", "y"), (1, 30L, "bob", "x"))
      .toDF("b", "id2", "name", "seg")
    val out = rows(Dedup.linkageScores(l, r, "b", "id", "id2",
      Seq(("name", 0.9, 0.1), ("seg", 0.8, 0.4))).orderBy("rid")
      .select("lid", "rid", "ag_name", "ag_seg", "score"))
    def w(x: Double) = math.rint(math.log(x) * 1e6) / 1e6
    val s1 = w(0.9 / 0.1) + w(0.2 / 0.6) // name agrees, seg disagrees
    val s2 = w(0.1 / 0.9) + w(0.8 / 0.4) // name disagrees, seg agrees
    assert(out == Seq(Seq(10L, 20L, true, false, s1),
      Seq(10L, 30L, false, true, s2)), s"got $out")
  }

  test("linkageScores: NULLs agree null-safely; bad m/u rejected") {
    val l = Seq((1, 1L, Option.empty[String])).toDF("b", "id", "f")
    val r = Seq((1, 2L, Option.empty[String]), (1, 3L, Option("x")))
      .toDF("b", "id2", "f")
    val out = rows(Dedup.linkageScores(l, r, "b", "id", "id2",
      Seq(("f", 0.9, 0.1))).orderBy("rid").select("rid", "ag_f"))
    assert(out == Seq(Seq(2L, true), Seq(3L, false)), s"got $out")
    intercept[IllegalArgumentException] {
      Dedup.linkageScores(l, r, "b", "id", "id2", Seq(("f", 0.1, 0.9)))
    }
  }

  test("benfordAudit: digit from decimal string — sub-1 values, negatives, zero excluded") {
    val df = Seq(123.45, 0.071, -85.0, 0.0, 9.99, 1e7).toDF("v")
    val out = rows(Checks.benfordAudit(df, "v").orderBy("digit")
      .select("digit", "n"))
    // digits: 1 (123.45), 7 (0.071→"0.07"→7), 8 (85), 9 (9.99), 1 (1e7); 0 dropped
    assert(out == Seq(Seq("1", 2L), Seq("7", 1L), Seq("8", 1L), Seq("9", 1L)),
      s"got $out")
  }
}
