package graft.pipeline

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join engagement — measured, not assumed. DEPLOY.md's skew
  * story has two halves: explicit salting for aggregations (A/B-gated
  * since round 4) and AQE's runtime skew-split for JOINS. This spec pins
  * the second half: a join whose left side concentrates 80% of its rows
  * on ONE key must come out of AQE with the sort-merge join marked
  * `skew=true` (the hot partition split into parallel sub-partitions),
  * and the result must equal the plain non-AQE join. Thresholds are
  * scaled down to fire at test size — the MECHANISM is what's under
  * test; production sizes use the defaults (DEPLOY.md).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("hot-key join: AQE splits the skewed partition (skew=true) and results match") {
    // 80% of fact rows share key 0; payload pads bytes so the hot
    // partition crosses the (lowered) skew threshold
    val fact = spark.range(0, 50000)
      .select(when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id"))
        .as("k"),
        concat(lit("x" * 64), col("id")).as("payload"))
    val dim = spark.range(0, 50000).select(col("id").as("k"),
      (col("id") * 7).as("w"))

    def joined = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"),
        sum("w").as("sw"))

    // reference: plain shuffle join, no AQE
    val want = withConfs("spark.sql.adaptive.enabled" -> "false") {
      rows(joined)
    }

    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      // forbid the broadcast shortcut — skew handling is what's under test
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val df = joined
      assert(rows(df) == want)
      val finalPlan = df.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(df.queryExecution.executedPlan)
      assert(finalPlan.toString.contains("skew=true"),
        s"expected a skew-split join in the final AQE plan:\n$finalPlan")
    }
  }
}
