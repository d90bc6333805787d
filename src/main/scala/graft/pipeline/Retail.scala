package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer/revenue segmentation analytics — the reporting queries a
  * warehouse user of the reference (supersonic/benchmark suites group-and-
  * rank shapes, e.g. benchmark/common/aggregate.cc) composes from
  * GroupAggregate + Sort: RFM customer scoring and ABC (Pareto) revenue
  * classification. Both are one fact-table aggregation followed by
  * windows over the AGGREGATED dimension table only (|customers| or
  * |parts| rows, never facts) — at 100 TB the fact scan shuffles once into
  * per-entity partials and everything after runs on a table 3-5 orders of
  * magnitude smaller. All scores are integer or decimal-exact so any SQL
  * engine replays them bit-for-bit.
  */
object Retail {

  /** RFM segmentation: per customer, Recency (whole days between the
    * customer's last order and the corpus-wide latest order), Frequency
    * (order count) and Monetary (exact DECIMAL(18,2) revenue sum), each
    * scored into k equi-depth bins by a GLOBAL ntile with the customer id
    * as deterministic tie-break (score 1 = best: most recent / most
    * frequent / highest spend). `segment` packs the three digits
    * (r·100 + f·10 + m) — the classic "111 is your best customer" code.
    *
    * Recency is integer µs arithmetic (micros difference floor-divided by
    * 86.4e9), never calendar functions, so engines with different
    * date-diff conventions agree exactly.
    *
    * Scale: one partial-agg exchange over the facts; the three ntile
    * windows run on the per-customer aggregate — a global sort each, but
    * of the DIMENSION table (TPC-H sf100 ≈ 15M customers ≈ few hundred MB
    * — one range exchange, not a bottleneck; the fact table never sees a
    * window). */
  def rfm(orders: DataFrame, custCol: String, tsCol: String,
          amountCol: String, k: Int = 5): DataFrame = {
    require(k > 0, "rfm: k must be positive")
    val perCust = orders
      .select(col(custCol).as("__cust"), col(tsCol).as("__ts"),
        col(amountCol).cast("decimal(18,2)").as("__amt"))
      .where(col("__cust").isNotNull && col("__ts").isNotNull)
      .groupBy(col("__cust"))
      .agg(max(col("__ts")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col("__amt")).as("monetary"))
    val ref = perCust.agg(max(col("__last")).as("__ref"))
    val nTot = perCust.agg(count(lit(1)).as("__n"))
    // round 8: the three global ntile windows (single reducer each over
    // the customer table) became three Profile.rowPositions range
    // exchanges + the closed-form ntileAt — identical scores
    // (spec-asserted vs the window function), every core live.
    val base = perCust.crossJoin(broadcast(ref))
      .withColumn("r_days",
        expr("timestampdiff(MICROSECOND, __last, __ref) div 86400000000"))
    val withR = Profile.rowPositions(base, "__rp",
      col("r_days").asc, col("__cust").asc)
    val withF = Profile.rowPositions(withR, "__fp",
      col("frequency").desc, col("__cust").asc)
    val withM = Profile.rowPositions(withF, "__mp",
      col("monetary").desc, col("__cust").asc)
    withM.crossJoin(broadcast(nTot))
      .withColumn("r_score",
        Profile.ntileAt(col("__rp"), col("__n"), k).cast("int"))
      .withColumn("f_score",
        Profile.ntileAt(col("__fp"), col("__n"), k).cast("int"))
      .withColumn("m_score",
        Profile.ntileAt(col("__mp"), col("__n"), k).cast("int"))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .select(col("__cust").as(custCol), col("r_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
  }

  /** ABC (Pareto) classification: rank entities by revenue descending
    * (entity id breaks ties), cumulate, and classify — 'A' while the
    * running share is ≤ cutA%, 'B' while ≤ cutB%, else 'C'. The share
    * comparisons are DECIMAL·INT against the scaled total (cum·100 ≤
    * total·cut), never a float division, so the class boundary cannot
    * drift between engines.
    *
    * Scale: one partial-agg exchange over the facts; the cumulative
    * window runs on the per-entity aggregate (dimension-sized — see
    * [[rfm]]). */
  def abcClassify(df: DataFrame, keyCol: String, amountCol: String,
                  cutA: Int = 80, cutB: Int = 95): DataFrame = {
    require(0 < cutA && cutA < cutB && cutB < 100,
      s"abcClassify: need 0 < cutA < cutB < 100, got $cutA/$cutB")
    val rev = df
      .select(col(keyCol).as("__k"),
        col(amountCol).cast("decimal(18,2)").as("__amt"))
      .where(col("__k").isNotNull)
      .groupBy(col("__k")).agg(sum(col("__amt")).as("revenue"))
    val total = rev.agg(sum(col("revenue")).as("__total"))
    // round 8: the single-reducer cumulative window became a
    // Profile.prefixFold range exchange (exclusive prefix + own revenue =
    // the same inclusive running sum, same decimal type).
    Profile.prefixFold(rev, Seq(col("revenue").desc, col("__k").asc),
        Seq(Profile.PrefixSum(col("revenue"), "__bef")))
      .withColumn("cum_revenue",
        (coalesce(col("__bef"), lit(0).cast("decimal(28,2)")) + col("revenue"))
          .cast("decimal(38,2)"))
      .drop("__bef")
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        when(col("cum_revenue") * 100 <= col("__total") * cutA, "A")
          .when(col("cum_revenue") * 100 <= col("__total") * cutB, "B")
          .otherwise("C"))
      .select(col("__k").as(keyCol), col("revenue"), col("cum_revenue"),
        col("abc_class"))
  }
}
