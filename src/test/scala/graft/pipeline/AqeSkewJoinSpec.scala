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

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot-key join: AQE splits the skewed partition (skew=true) and results match") {
    import spark.implicits._
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
    val want = withConfsCollect("spark.sql.adaptive.enabled" -> "false")(joined)

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
      val got = df.collect().toSeq.map(_.toSeq)
      assert(got == want)
      val finalPlan = df.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(df.queryExecution.executedPlan)
      assert(finalPlan.toString.contains("skew=true"),
        s"expected a skew-split join in the final AQE plan:\n$finalPlan")
    }
  }

  private def withConfsCollect(pairs: (String, String)*)(
      df: => org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    var out: Seq[Seq[Any]] = null
    withConfs(pairs: _*) { out = df.collect().toSeq.map(_.toSeq) }
    out
  }
}
