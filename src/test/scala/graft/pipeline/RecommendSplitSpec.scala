package graft.pipeline

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Item-item cosine recommendations, stratified k-fold assignment, and
  * commit-log time travel. */
class RecommendSplitSpec extends SparkSpec {
  import spark.implicits._

  test("itemPairCosine: hand-computed cosines, both directions, top-k cut") {
    // baskets: {a,b}, {a,b}, {a,c} → c_a=3, c_b=2, c_c=1; c_ab=2, c_ac=1
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"))
      .toDF("b", "i")
    val out = rows(Association.itemPairCosine(df, "b", "i",
      minPairCount = 1L, topK = 2).orderBy("i1", "rank")
      .select("i1", "i2", "c12", "cosine", "rank"))
    val cosAb = math.rint(2.0 / math.sqrt(3.0 * 2.0) * 1e6) / 1e6
    val cosAc = math.rint(1.0 / math.sqrt(3.0 * 1.0) * 1e6) / 1e6
    assert(out == Seq(
      Seq("a", "b", 2L, cosAb, 1), Seq("a", "c", 1L, cosAc, 2),
      Seq("b", "a", 2L, cosAb, 1),
      Seq("c", "a", 1L, cosAc, 1)), s"got $out")
  }

  test("itemPairCosine: minPairCount prunes and topK caps") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"))
      .toDF("b", "i")
    val out = Association.itemPairCosine(df, "b", "i", minPairCount = 2L, topK = 1)
    // only (a,b) co-occurs twice; each direction ranked 1
    assert(rows(out.select("i1", "i2", "c12")).toSet ==
      Set(Seq("a", "b", 2L), Seq("b", "a", 2L)))
  }

  test("stratifiedKFold: exact per-stratum balance and partitioning invariance") {
    val df = (1 to 103).map(i => (if (i % 3 == 0) "x" else "y", i.toLong))
      .toDF("s", "id")
    withPartitionings(df) { d =>
      val folds = Sampling.stratifiedKFold(d, Seq("s"), k = 4, seed = 7L, Seq("id"))
      val sizes = rows(folds.groupBy("s", "fold").count().orderBy("s", "fold"))
      // stratum x: 34 rows → 9/9/8/8; stratum y: 69 → 18/17/17/17
      val byStratum = sizes.groupBy(_(0)).view.mapValues(_.map(_(2).asInstanceOf[Long]))
      byStratum.foreach { case (s, ns) =>
        assert(ns.max - ns.min <= 1, s"stratum $s unbalanced: $ns")
      }
      assert(sizes.map(_(2).asInstanceOf[Long]).sum == 103L)
    }
  }

  test("stratifiedKFold: assignment is a pure function of (key, seed); seeds differ") {
    val df = (1 to 60).map(i => ("s", i.toLong)).toDF("s", "id")
    def assign(seed: Long) =
      rows(Sampling.stratifiedKFold(df, Seq("s"), 3, seed, Seq("id"))
        .orderBy("id").select("id", "fold"))
    assert(assign(1L) == assign(1L))
    assert(assign(1L) != assign(2L), "different seeds must permute folds")
  }

  test("time travel: add/remove commits resolve to the right file sets") {
    val base = java.nio.file.Files.createTempDirectory("graft_tt_spec").toString
    try {
      val a = Seq((1L, "a")).toDF("k", "v")
      val b = Seq((2L, "b")).toDF("k", "v")
      val c = Seq((3L, "c")).toDF("k", "v")
      Relational.fileOutput(a, s"$base/f0")
      Relational.commitVersion(base, 0, Seq(s"$base/f0"), Nil)
      Relational.fileOutput(b, s"$base/f1")
      Relational.commitVersion(base, 1, Seq(s"$base/f1"), Nil)
      Relational.fileOutput(c, s"$base/f2")
      Relational.commitVersion(base, 2, Seq(s"$base/f2"), Seq(s"$base/f0"))
      def keys(asOf: Option[Int]) =
        rows(Relational.readSnapshot(spark, base, asOf).select("k").orderBy("k"))
          .map(_.head)
      assert(keys(Some(0)) == Seq(1L))
      assert(keys(Some(1)) == Seq(1L, 2L))
      assert(keys(Some(2)) == Seq(2L, 3L))
      assert(keys(None) == Seq(2L, 3L), "latest = newest version")
      // guards: duplicate version, empty commit
      intercept[IllegalArgumentException] {
        Relational.commitVersion(base, 2, Seq(s"$base/f0"), Nil)
      }
      intercept[IllegalArgumentException] {
        Relational.commitVersion(base, 3, Nil, Nil)
      }
    } finally {
      graft.streaming.Streams.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }
}
