package graft.types

import graft.SparkSpec
import graft.lifecycle.Lifecycle
import graft.functions.VectorExpressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TypesAndLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("type mapping mirrors the reference table incl. unsigned widening") {
    assert(GraftTypes.toSpark("INT32") == IntegerType)
    assert(GraftTypes.toSpark("UINT64") == LongType)
    assert(GraftTypes.toSpark("DATETIME") == TimestampType)
    assert(GraftTypes.toSpark("ENUM") == StringType)
  }

  test("schema merge rejects duplicate attribute names (TryMerge -> None)") {
    val a = StructType(Seq(GraftTypes.attribute("x", "INT32", nullable = false)))
    val b = StructType(Seq(GraftTypes.attribute("y", "STRING", nullable = true)))
    assert(GraftTypes.mergeSchemas(a, b).fieldNames.toSeq == Seq("x", "y"))
    assert(GraftTypes.tryMergeSchemas(a, a).isEmpty)
    intercept[IllegalArgumentException] { GraftTypes.mergeSchemas(a, a) }
  }

  test("enum definition: decode/encode round-trip, undefined -> NULL, dup rejected") {
    val e = GraftTypes.EnumDefinition(Seq(1 -> "RED", 2 -> "BLUE"))
    val df = Seq(1, 2, 9).toDF("code")
    assert(rows(df.select(e.decode(col("code")))).flatten == Seq("RED", "BLUE", null))
    val names = Seq("BLUE", "GREEN").toDF("n")
    assert(rows(names.select(e.encode(col("n")))).flatten == Seq(2, null))
    intercept[IllegalArgumentException] {
      GraftTypes.EnumDefinition(Seq(1 -> "A", 1 -> "B"))
    }
  }

  test("lifecycle: operation -> cursor -> block-wise next() to EOS") {
    val op = Lifecycle.operation(spark.range(10).toDF("i").orderBy("i"))
    val cur = op.createCursor()
    val b1 = cur.next(4)
    val b2 = cur.next(4)
    val b3 = cur.next(4)
    assert(b1.map(_.getLong(0)) == Seq(0L, 1L, 2L, 3L))
    assert(b2.map(_.getLong(0)) == Seq(4L, 5L, 6L, 7L))
    assert(b3.map(_.getLong(0)) == Seq(8L, 9L))
    assert(!cur.hasNext && cur.next(4).isEmpty)
  }

  test("lifecycle: binding errors surface before any pull, like the reference") {
    // Spark 4 analyzes eagerly on transformation — binding errors surface
    // when the operation tree is constructed, never during next().
    intercept[Exception] {
      val bad = spark.range(1).toDF("i").select(col("nonexistent"))
      Lifecycle.operation(bad).createCursor()
    }
  }

  test("vec_dot native expression matches the HOF fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.7f, 0.8f, 0.9f))
    ).toDF("a", "b")
    val native = rows(df.select(vec_dot(col("a"), col("b")))).map(_.head)
    val hof = rows(df.select(graft.pipeline.Similarity.dotHof(
      transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double")))))
      .map(_.head)
    assert(native == hof)
    // double arrays too
    val dd = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    assert(rows(dd.select(vec_dot(col("a"), col("b")))).head.head == 13.0)
    // cosine of identical vectors is 1.0
    assert(rows(df.select(vec_cosine(col("a"), col("a")))).map(_.head) == Seq(1.0, 1.0))
  }

  test("vec_dot rejects non-vector input types at analysis") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] { df.select(vec_dot(col("a"), col("b"))).collect() }
  }
}
