package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch aggregations: accuracy contracts on hand-built data where the
  * exact answers are known. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (1 to 1000).map(i => ("g", (i % 100).toLong)) ++
    (1 to 500).map(_ => ("g", 7L))

  test("approxDistinctWithCheck: estimate within bound of the exact count") {
    val df = skewed.toDF("g", "v")
    val out = rows(Sketches.approxDistinctWithCheck(df, Seq("g"), "v")
      .select("nd_exact", "nd_ok")).head
    assert(out == Seq(100L, true))
  }

  test("approxQuantilesWithCheck: approx quantiles track exact percentiles") {
    val df = (1 to 1001).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = rows(Sketches.approxQuantilesWithCheck(df, Seq("g"), "v",
      Seq(0.25, 0.5, 0.75)).select("q_exact", "q_ok")).head
    assert(out(0).asInstanceOf[scala.collection.Seq[Double]] == Seq(251.0, 501.0, 751.0))
    assert(out(1) == true)
  }

  test("topKFrequencyWithCheck handles string and int keys (generic key types)") {
    // non-Long keys must probe the sketch with the runtime type the
    // aggregate hashed: ints widen to long, strings hash their UTF-8 bytes
    val strDf = (Seq.fill(5)("hot") ++ Seq("a", "b", "c", null)).toDF("s")
    val strOut = rows(Sketches.topKFrequencyWithCheck(strDf, "s", k = 2)
      .orderBy(col("n_exact").desc, col("s")))
    assert(strOut.head == Seq("hot", 5L, 5L, true))
    assert(strOut.forall(_(3) == true) && strOut.length == 2) // null key excluded
    val intDf = (Seq.fill(4)(9) ++ Seq(1, 2)).toDF("i")
    val intOut = rows(Sketches.topKFrequencyWithCheck(intDf, "i", k = 1))
    assert(intOut == Seq(Seq(9, 4L, 4L, true)))
  }

  test("topKFrequencyWithCheck: CMS estimates bound the exact counts from above") {
    val df = skewed.toDF("g", "v")
    val out = Sketches.topKFrequencyWithCheck(df, "v", k = 3)
    val got = rows(out.orderBy(col("n_exact").desc, col("v")))
    // key 7 appears 10 (from i%100) + 500 extra = 510 times; others 10
    assert(got.head(0) == 7L && got.head(1) == 510L && got.head(3) == true)
    assert(got.forall(_(3) == true))
    assert(got.length == 3)
  }
}
