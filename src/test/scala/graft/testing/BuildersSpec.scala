package graft.testing

import graft.SparkSpec
import graft.operators.Relational
import graft.testing.Builders._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class BuildersSpec extends SparkSpec {

  /** Property-check helper over ScalaCheck generators with fixed seeds
    * (scalatest-scalacheck bridge isn't on the classpath; sampling the Gen
    * directly keeps the property style and determinism). */
  private def forSamples[A](gen: Gen[A], n: Int = 5)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }
  import spark.implicits._

  test("block builder: option DSL with NULL marker") {
    val df = block(spark,
      "k" -> Seq(Some("a"), Some("b"), Some("c")),
      "v" -> Seq(Some(1), __, Some(3)))
    assert(df.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(rows(df.orderBy("k")) == Seq(Seq("a", 1), Seq("b", null), Seq("c", 3)))
  }

  test("repeatingBlock cycles the block") {
    val df = block(spark, "x" -> Seq(Some(1), Some(2)))
    val rep = repeatingBlock(df, 3)
    assert(rep.count() == 6)
    assert(rows(rep.groupBy("x").count().orderBy("x")) == Seq(Seq(1, 3L), Seq(2, 3L)))
  }

  test("scanWithSelection repeats/drops/reorders rows by rowid") {
    val df = spark.range(5).toDF("v") // rowids 0..4 in range order
    val sel = Seq((0, 3L), (1, 1L), (2, 3L)).toDF("pos", "rowid")
    val out = Relational.scanWithSelection(df, sel)
    assert(rows(out).flatten == Seq(3L, 1L, 3L))
  }

  test("file output/input round-trip preserves schema and data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString + "/t"
    val df = block(spark, "a" -> Seq(Some(1), __), "b" -> Seq(Some("x"), Some("y")))
    Relational.fileOutput(df, dir)
    val back = Relational.scanParquet(spark, dir)
    assert(back.schema.fieldNames.sorted.toSeq == Seq("a", "b"))
    assert(rows(back.orderBy("b")) == Seq(Seq(1, "x"), Seq(null, "y")))
  }

  test("property: group-aggregate of parts == aggregate of whole (ScalaCheck)") {
    import graft.operators.Aggregates._
    forSamples(Gen.listOfN(40, Gen.chooseNum(-100, 100))) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i % 3, v) }.toDF("k", "v")
      // total sum via per-key partial then re-aggregate == direct scalar agg
      val partial = groupAggregate(Seq("k"), Seq(Agg(SUM, Some("v"), "s")))(df)
      val total = rows(scalarAggregate(Seq(Agg(SUM, Some("s"), "t")))(partial)).head.head
      val direct = rows(scalarAggregate(Seq(Agg(SUM, Some("v"), "t")))(df)).head.head
      assert(total == direct)
    }
  }

  test("property: sort is permutation-invariant (ScalaCheck)") {
    forSamples(Gen.listOfN(30, Gen.chooseNum(0L, 50L))) { xs =>
      val shuffled = new scala.util.Random(7).shuffle(xs)
      val sorted1 = rows(Relational.sort(col("x"))(xs.toDF("x"))).flatten
      val sorted2 = rows(Relational.sort(col("x"))(shuffled.toDF("x"))).flatten
      assert(sorted1 == sorted2 && sorted1 == xs.sorted)
    }
  }
}
