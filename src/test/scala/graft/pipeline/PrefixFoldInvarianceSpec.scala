package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Execution-config invariance for the prefixFold family — the global-rank
  * primitives that replace single-reducer `Window.orderBy`.
  *
  * The one real scale bug these primitives ever shipped (r8, caught only by
  * the sf1 sweep) was an AQE interaction: two branches re-executing the
  * range exchange could renumber `spark_partition_id` differently and
  * corrupt the cross-partition offsets. That class of bug is invisible at
  * one fixed test config, so this spec pins the LAW directly: for a total
  * sort order, prefixFold / rowPositions / groupedRowPositions output is
  * IDENTICAL under AQE on/off × shuffle-partition counts × input
  * re-shapings, and equal to the single-reducer window reference. Skewed
  * keys, duplicate sort keys, NULL values and a NULL group are all in the
  * fixture because each has its own failure mode (range-boundary ties,
  * null-safe fix-up join, typed-zero coalescing). */
class PrefixFoldInvarianceSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic skewed fixture: ~70% of rows collide on 5 hot sort keys
  // (range-partitioner boundary stress), values have NULL holes, the group
  // column has a NULL group alongside two real ones.
  private lazy val base: DataFrame = {
    val rows = (0 until 4000).map { id =>
      val k = if (id % 10 < 7) id % 5 else 5 + id % 397
      val v: java.lang.Long = if (id % 13 == 0) null else (id % 89L) - 40L
      val g: String = (id % 4) match {
        case 0 | 3 => "a"
        case 1     => "b"
        case _     => null
      }
      (id.toLong, k.toLong, v, g)
    }
    rows.toDF("id", "k", "v", "g")
  }

  /** Run `body` under every combination of AQE on/off, shuffle partition
    * count, and input re-shaping; restore session confs afterwards. */
  private def sweep(assertOne: (DataFrame, String) => Unit): Unit = {
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled", "true")
    val parts0 = conf.get("spark.sql.shuffle.partitions")
    try {
      for {
        aqe <- Seq("true", "false")
        parts <- Seq("1", "7", "31")
        (reshape, rname) <- Seq[(DataFrame => DataFrame, String)](
          (identity, "as-is"), (_.repartition(13), "repartition(13)"))
      } {
        conf.set("spark.sql.adaptive.enabled", aqe)
        conf.set("spark.sql.shuffle.partitions", parts)
        assertOne(reshape(base), s"aqe=$aqe parts=$parts input=$rname")
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe0)
      conf.set("spark.sql.shuffle.partitions", parts0)
    }
  }

  private def byId(df: DataFrame, outCol: String): Map[Long, Any] =
    df.select(col("id"), col(outCol)).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap

  test("prefixFold sum+max == single-reducer window under 12 exec configs (desc sort col)") {
    // Mixed-direction total order: k DESC, id ASC — pins the
    // RangePartitioner-follows-descending-columns contract too.
    val sortCols = Seq(col("k").desc, col("id").asc)
    val wRef = Window.orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = byId(
      base.withColumn("ps", sum($"v").over(wRef))
        .withColumn("pm", max($"v").over(wRef)), "ps")
    val expectedMax = byId(
      base.withColumn("pm", max($"v").over(wRef)), "pm")
    sweep { (in, cfg) =>
      val got = Profile.prefixFold(in, sortCols,
        Seq(Profile.PrefixSum($"v", "ps"), Profile.PrefixMax($"v", "pm")))
      assert(byId(got, "ps") == expected, s"prefix sum diverged at $cfg")
      assert(byId(got, "pm") == expectedMax, s"prefix max diverged at $cfg")
    }
  }

  test("rowPositions == row_number()-1 under 12 exec configs") {
    val sortCols = Seq(col("k").asc, col("id").asc)
    val expected = byId(
      base.withColumn("pos",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long") - 1L),
      "pos")
    sweep { (in, cfg) =>
      val got = Profile.rowPositions(in, "pos", sortCols: _*)
      assert(byId(got, "pos") == expected, s"rowPositions diverged at $cfg")
    }
  }

  test("groupedRowPositions (incl. NULL group) + ntileAt == partitioned window under 12 exec configs") {
    val wRef = Window.partitionBy($"g").orderBy($"k".asc, $"id".asc)
    val wCnt = Window.partitionBy($"g")
    val ref = base
      .withColumn("pos", row_number().over(wRef).cast("long") - 1L)
      .withColumn("nt", ntile(7).over(wRef).cast("long"))
      .withColumn("n", count(lit(1)).over(wCnt))
    val expectedPos = byId(ref, "pos")
    val expectedNt = byId(ref, "nt")
    sweep { (in, cfg) =>
      val got = Profile.groupedRowPositions(in, Seq($"g"), "pos",
          $"k".asc, $"id".asc)
        .join(base.groupBy($"g".as("g2")).agg(count(lit(1)).as("n")),
          $"g" <=> $"g2")
        .withColumn("nt", Profile.ntileAt($"pos", $"n", 7))
      assert(byId(got, "pos") == expectedPos,
        s"groupedRowPositions diverged at $cfg")
      assert(byId(got, "nt") == expectedNt, s"ntileAt diverged at $cfg")
    }
  }
}
