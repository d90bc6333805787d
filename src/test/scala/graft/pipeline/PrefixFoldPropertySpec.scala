package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized differential property for the prefixFold family: on SEEDED
  * random fixtures — varying row counts (including empty), duplicate-key
  * density, NULL rates in both value and group columns, negative values,
  * group cardinalities — the distributed primitives must equal their
  * single-reducer `Window.orderBy` references row-for-row. The fixed
  * skewed fixture lives in PrefixFoldInvarianceSpec (12 exec configs);
  * this spec walks the INPUT space instead. Seeded ⇒ deterministic. */
class PrefixFoldPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260815L)

  private def fixture(n: Int) = {
    val dupPool = math.max(1, rng.nextInt(1 + n)) // small pool → heavy ties
    val nullRate = rng.nextDouble() * 0.4
    val groups = 1 + rng.nextInt(5)
    (0 until n).map { i =>
      val v = if (rng.nextDouble() < nullRate) None
              else Some((rng.nextInt(dupPool) - dupPool / 2).toLong)
      val g = if (rng.nextDouble() < 0.2) None
              else Some(s"g${rng.nextInt(groups)}")
      (i.toLong, v, g)
    }.toDF("id", "v", "g")
  }

  test("property: prefixFold sum+max == window reference on 12 random fixtures") {
    (1 to 12).foreach { round =>
      val df = fixture(rng.nextInt(400))
      val sort = Seq(col("v").asc_nulls_first, col("id").asc) // total order
      val got = Profile.prefixFold(df, sort,
          Seq(Profile.PrefixSum(col("v"), "ps"),
            Profile.PrefixMax(col("v"), "pm")))
        .select("id", "ps", "pm").orderBy("id")
        .collect().toSeq.map(_.toSeq)
      val w = Window.orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = df.select(col("id"), sum("v").over(w).as("ps"),
          max("v").over(w).as("pm")).orderBy("id")
        .collect().toSeq.map(_.toSeq)
      assert(got == want, s"round $round")
    }
  }

  test("property: rowPositions == row_number()-1 on 12 random fixtures") {
    (1 to 12).foreach { round =>
      val df = fixture(rng.nextInt(400))
      val sort = Seq(col("v").desc_nulls_last, col("id").asc)
      val got = Profile.rowPositions(df, "pos", sort: _*)
        .select("id", "pos").orderBy("id").collect().toSeq.map(_.toSeq)
      val want = df.select(col("id"),
          (row_number().over(Window.orderBy(sort: _*)) - 1).cast("long").as("pos"))
        .orderBy("id").collect().toSeq.map(_.toSeq)
      assert(got == want, s"round $round")
    }
  }

  test("property: groupedRowPositions (NULL groups included) == partitioned window on 12 random fixtures") {
    (1 to 12).foreach { round =>
      val df = fixture(rng.nextInt(400))
      val sort = Seq(col("v").asc_nulls_first, col("id").asc)
      val got = Profile.groupedRowPositions(df, Seq(col("g")), "pos", sort: _*)
        .select("id", "pos").orderBy("id").collect().toSeq.map(_.toSeq)
      val want = df.select(col("id"),
          (row_number().over(Window.partitionBy("g").orderBy(sort: _*)) - 1)
            .cast("long").as("pos"))
        .orderBy("id").collect().toSeq.map(_.toSeq)
      assert(got == want, s"round $round")
    }
  }
}
