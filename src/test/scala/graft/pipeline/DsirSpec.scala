package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val pool = Seq(
    (1L, "alpha beta alpha beta alpha beta"), // pure target-style bigrams
    (2L, "gamma delta gamma delta gamma delta"), // pure off-target
    (3L, "alpha beta gamma delta"), // mixed
    (4L, "solo"), // < 2 tokens: no features
    (5L, "alpha beta alpha beta") // target-style, shorter
  ).toDF("id", "text")
  private val target = Seq(
    (100L, "alpha beta alpha beta"),
    (101L, "alpha beta")).toDF("id", "text")

  test("importanceScores: target-like docs outrank off-target; no-feature doc scores 0") {
    val scored = Dsir.importanceScores(pool, target, "id", "text", buckets = 64)
    val m = rows(scored.orderBy("id"))
      .map(r => r(0).asInstanceOf[Long] ->
        (r(1).asInstanceOf[Long], BigDecimal(r(2).toString))).toMap
    assert(m(4)._1 == 0L && m(4)._2 == 0, s"feature-less doc must score 0: $m")
    assert(m(1)._1 == 5L, "5 bigrams in a 6-token doc")
    // per-feature advantage: doc 1 (all target bigrams) beats doc 2 (none)
    assert(m(1)._2 > m(2)._2, s"target-like must outscore off-target: $m")
    assert(m(3)._2 > m(2)._2 && m(3)._2 < m(1)._2, s"mixed in between: $m")
  }

  test("selectTopFraction: exact integer rule; importance ordering holds") {
    val scored = Dsir.importanceScores(pool, target, "id", "text", buckets = 64)
    val sel = Dsir.selectTopFraction(scored, "id", num = 2, den = 5)
    val kept = rows(sel.where(col("keep")).select("id").orderBy("id")).flatten
    assert(kept.size == 2, s"top 2/5 of 5 docs: $kept") // rank·5 < 5·2 ⇔ rank < 2
    val ranked = rows(sel.orderBy("rank").select("id")).flatten
    // on this tiny target every feature-bearing doc sums NEGATIVE (the
    // Laplace mass dominates), so the neutral no-feature doc (score 0 =
    // importance weight 1) correctly ranks first; among feature-bearing
    // docs the target-style ones outrank off-target, and the off-target
    // doc is strictly last
    assert(ranked == Seq(4L, 5L, 1L, 3L, 2L), s"rank order: $ranked")
    assert(kept == Seq(4L, 5L), s"kept: $kept")
  }

  test("withPartitionings: scores identical under repartitioning (decimal sums)") {
    withPartitionings(pool) { p =>
      val scored = Dsir.importanceScores(p, target, "id", "text", buckets = 64)
      val got = rows(scored.select(col("id"), col("score").cast("string")).orderBy("id"))
      val base = rows(Dsir.importanceScores(pool, target, "id", "text", 64)
        .select(col("id"), col("score").cast("string")).orderBy("id"))
      assert(got == base)
    }
  }
}
