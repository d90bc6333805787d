package graft.functions

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bloom join contract: never a false negative (result equals the plain
  * join), bounded false positives (the pre-filter genuinely prunes), NULL
  * keys dropped like join semantics, outer joins rejected.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_might_contain: no false negatives, NULL yields NULL") {
    val build = spark.range(0, 100).toDF("k")
    val bf = build.stat.bloomFilter("k", 100, 0.03)
    val probe = Seq[Option[Long]](Some(5L), Some(50L), Some(1000000L), None)
      .toDF("k")
    val got = probe.select(col("k"),
      BloomExpressions.bloom_might_contain(col("k"), bf).as("hit")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
        (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(5L) == true && got(50L) == true) // inserted keys always hit
    assert(got(null) == null) // three-valued: a Filter drops it
  }

  test("bloom_might_contain: int key widths accepted, non-integral rejected") {
    val build = spark.range(0, 10).toDF("k")
    val bf = build.stat.bloomFilter("k", 10, 0.03)
    val probe = Seq(1, 2, 99).toDF("ki") // IntegerType probe vs long-built filter
    val hits = probe.select(
      BloomExpressions.bloom_might_contain(col("ki"), bf).as("h"))
      .where(col("h")).count()
    assert(hits >= 2) // 1 and 2 must hit
    intercept[Exception] {
      Seq("x").toDF("s").select(
        BloomExpressions.bloom_might_contain(col("s"), bf)).collect()
    }
  }

  test("bloomJoin equals the plain join (false positives removed by the exact join)") {
    val probe = spark.range(0, 2000).toDF("pk")
      .withColumn("v", col("pk") % 7)
    val build = spark.range(0, 2000).where(col("id") % 10 === 0)
      .toDF("bk") // every 10th key
    withPartitionings(probe) { p =>
      val got = Relational.bloomJoin(p, build, "pk", "bk",
        expectedItems = 1000)
      val exact = p.join(build, col("pk") === col("bk"))
      assert(got.select("pk", "v", "bk").except(exact.select("pk", "v", "bk")).isEmpty)
      assert(exact.select("pk", "v", "bk").except(got.select("pk", "v", "bk")).isEmpty)
      assert(got.count() == 200)
    }
  }

  test("bloomJoin prunes the probe side before the join (selectivity)") {
    val probe = spark.range(0, 5000).toDF("pk")
    val build = spark.range(0, 50).toDF("bk") // 1% selective
    val bf = build.stat.bloomFilter("bk", 50, 0.03)
    val pruned = probe.where(
      BloomExpressions.bloom_might_contain(col("pk"), bf)).count()
    // all 50 true keys survive; false positives bounded well under 3% + slack
    assert(pruned >= 50 && pruned < 50 + (5000 * 0.06).toLong,
      s"bloom kept $pruned of 5000 — fpp contract broken")
  }

  test("bloom_might_contain generates compiling code (no codegen fallback)") {
    withConfs("spark.sql.codegen.fallback" -> "false") {
      val build = spark.range(0, 1000).toDF("k")
      val bf = build.stat.bloomFilter("k", 1000, 0.03)
      val n = spark.range(0, 10000).toDF("k")
        .where(BloomExpressions.bloom_might_contain(col("k"), bf)).count()
      assert(n >= 1000) // all inserted keys hit even through generated code
    }
  }

  test("bloomJoin: left_semi supported, outer joins rejected") {
    val probe = spark.range(0, 100).toDF("pk")
    val build = spark.range(0, 100).where(col("id") % 2 === 0).toDF("bk")
    val semi = Relational.bloomJoin(probe, build, "pk", "bk", "left_semi",
      expectedItems = 100)
    assert(semi.columns.toSeq == Seq("pk") && semi.count() == 50)
    intercept[IllegalArgumentException] {
      Relational.bloomJoin(probe, build, "pk", "bk", "left_outer")
    }
  }
}
