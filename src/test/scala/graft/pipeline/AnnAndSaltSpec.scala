package graft.pipeline

import graft.SparkSpec
import graft.operators.Aggregates
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._

class AnnAndSaltSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k achieves high recall vs brute force on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("qid", "vec_id")).map(r => (r(0), r(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qv", 5))
    val ivf = pairs(Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, nCells = 8, nprobe = 4))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low (nprobe=4 of 8 cells)")
    assert(ivf.size <= brute.size)
  }

  test("saltedGroupAggregate matches plain groupAggregate for SUM/MIN/MAX/COUNT") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "hot", i)).toDF("k", "v")
    withPartitionings(df) { d =>
      val salted = rows(Aggregates.saltedGroupAggregate(Seq("k"), Seq(
        Agg(SUM, Some("v"), "s"), Agg(MIN, Some("v"), "mn"),
        Agg(MAX, Some("v"), "mx"), Agg(COUNT, None, "n")), saltBuckets = 8)(d)
        .orderBy("k"))
      val plain = rows(Aggregates.groupAggregate(Seq("k"), Seq(
        Agg(SUM, Some("v"), "s"), Agg(MIN, Some("v"), "mn"),
        Agg(MAX, Some("v"), "mx"), Agg(COUNT, None, "n")))(d).orderBy("k"))
      assert(salted == plain)
    }
    intercept[IllegalArgumentException] {
      Aggregates.saltedGroupAggregate(Seq("k"), Seq(
        Agg(COUNT, Some("v"), "n", distinct = true)))(df)
    }
  }

  test("saltedCollectSorted equals sort_array(collect_list) per key") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "hot", i % 37))
      .toDF("k", "v")
    withPartitionings(df) { d =>
      val salted = rows(Aggregates.saltedCollectSorted(Seq("k"), "v", "vals",
        saltBuckets = 8)(d).orderBy("k"))
      val plain = rows(d.groupBy("k")
        .agg(sort_array(collect_list(col("v"))).as("vals")).orderBy("k"))
      assert(salted == plain)
    }
  }

  test("semanticDedup: planted near-dups collapse to the min-id canonical, " +
    "distinct vectors survive") {
    import graft.pipeline.Similarity
    // two orthogonal base directions + near-copies (tiny perturbation in a
    // third dimension keeps cosine ≈ 0.999) — ids chosen so canonicals are
    // the small ids
    def vec(x: Double, y: Double, z: Double) = Array(x, y, z)
    val data = Seq(
      (0L, vec(1, 0, 0)), (10L, vec(1, 0, 0.01)), (20L, vec(1, 0, -0.01)),
      (1L, vec(0, 1, 0)), (11L, vec(0, 1, 0.01)),
      (2L, vec(0.7, 0.7, 0)) // distinct: cosine vs both groups ≈ 0.7
    ).toDF("id", "v")
    val cents = Array(vec(1, 0, 0), vec(0, 1, 0))
    withPartitionings(data) { d =>
      val out = Similarity.semanticDedup(d, "id", "v", cents, tau = 0.99)
        .orderBy("id")
      assert(rows(out) == Seq(
        Seq(0L, 0L, true), Seq(1L, 1L, true), Seq(2L, 2L, true),
        Seq(10L, 0L, false), Seq(11L, 1L, false), Seq(20L, 0L, false)))
    }
  }

  test("semanticDedup: cross-cell near-dups are NOT paired (documented cell blocking)") {
    import graft.pipeline.Similarity
    // one vector per cell, nearly identical — lands in different cells, so
    // the within-cell verify never sees the pair: the SemDeDup trade-off
    val data = Seq((0L, Array(1.0, 0.004, 0.0)), (1L, Array(1.0, -0.004, 0.0)))
      .toDF("id", "v")
    val cents = Array(Array(1.0, 0.005, 0.0), Array(1.0, -0.005, 0.0))
    val out = Similarity.semanticDedup(data, "id", "v", cents, tau = 0.9)
    assert(out.where(col("kept")).count() == 2)
  }

  test("GraftExtensions registers vec_dot and simhash64 for SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS r")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    val sh = spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS h")
      .collect().head.getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS h")
      .collect().head.getLong(0)
    assert(sh == sh2)
  }
}
