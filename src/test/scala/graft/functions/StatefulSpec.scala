package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stateful running expressions vs the reference semantics
  * (stateful_expressions.h:39-69). */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  // (ord, value) stream per the reference's single-stream model
  private def df = Seq(
    (1, Some(10)), (2, None), (3, Some(10)), (4, Some(7)), (5, None)
  ).toDF("ord", "v")

  private val part = Seq.empty[org.apache.spark.sql.Column]
  private val ord = Seq(col("ord"))

  test("changed: null-aware — value<->NULL transitions count as changes") {
    val out = df.select(col("ord"),
      Stateful.changed(col("v"), part, ord).as("c")).orderBy("ord")
    // 10, NULL, 10, 7, NULL — every adjacent pair differs (null-safely)
    assert(rows(out).map(_(1)) == Seq(true, true, true, true, true))
  }

  test("changed exact sequence") {
    val d2 = Seq((1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "a")).toDF("ord", "v")
    val out = d2.select(col("ord"), Stateful.changed(col("v"), part, ord).as("c"))
      .orderBy("ord")
    assert(rows(out).map(_(1)) == Seq(true, false, true, false, true))
  }

  test("runningSum ignores NULLs, NULL until first non-null") {
    val d2 = Seq((1, None), (2, Some(5)), (3, None), (4, Some(2))).toDF("ord", "v")
    val out = d2.select(col("ord"), Stateful.runningSum(col("v"), part, ord).as("s"))
      .orderBy("ord")
    assert(rows(out).map(_(1)) == Seq(null, 5L, 5L, 7L))
  }

  test("smudge carries last observation forward") {
    val out = df.select(col("ord"), Stateful.smudge(col("v"), part, ord).as("s"))
      .orderBy("ord")
    assert(rows(out).map(_(1)) == Seq(10, 10, 10, 7, 7))
  }

  test("runningMinWithFlush resets at flush rows") {
    val d2 = Seq((1, 5, false), (2, 3, false), (3, 9, true), (4, 4, false), (5, 6, false))
      .toDF("ord", "v", "flush")
    val out = Stateful.runningMinWithFlush(d2, col("v"), col("flush"), "m", part, ord)
      .orderBy("ord")
    assert(rows(out.select("m")).flatten == Seq(5, 3, 9, 4, 4))
  }

  test("smudgeIf carries value while condition holds") {
    val d2 = Seq((1, 10, false), (2, 99, true), (3, 98, true), (4, 20, false), (5, 97, true))
      .toDF("ord", "v", "cond")
    val out = Stateful.smudgeIf(d2, col("v"), col("cond"), "s", part, ord)
      .orderBy("ord")
    assert(rows(out.select("s")).flatten == Seq(10, 10, 10, 20, 20))
  }

  test("partitioned: state never crosses partition keys") {
    val d2 = Seq(("u1", 1, 10), ("u1", 2, 20), ("u2", 1, 5)).toDF("u", "ord", "v")
    val out = d2.select(col("u"), col("ord"),
      Stateful.runningSum(col("v"), Seq(col("u")), Seq(col("ord"))).as("s"))
      .orderBy("u", "ord")
    assert(rows(out).map(_(2)) == Seq(10L, 30L, 5L))
  }
}
