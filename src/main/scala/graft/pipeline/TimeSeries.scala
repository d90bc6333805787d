package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with gap fill — the
  * feature-engineering step that turns an irregular event stream into
  * the fixed-step series a model consumes (per-entity activity curves,
  * sensor downsampling). Beyond-reference surface, same family as the
  * windowed/sessionized event operators in graft.streaming.
  */
object TimeSeries {

  private val Units = Set("minute", "hour", "day", "week")

  /** Resample each key's events onto a regular `unit` grid spanning that
    * key's [first, last] bucket, carrying (n, forward-filled sum):
    * gap buckets get n = 0 and the LAST OBSERVED per-bucket sum
    * (leading gaps stay NULL — nothing observed yet is not zero).
    *
    * The per-bucket sum aggregates in DECIMAL(18,6): decimal sums
    * commute exactly, so the output is bit-stable under any
    * partitioning AND SQL-replayable (a double sum is neither — Spark's
    * reduce order is nondeterministic); the fill then propagates the
    * exact decimal and only the final output casts to double.
    *
    * Plan shape: one partial/final aggregation keyed by (key, bucket),
    * one tiny per-key span aggregation, one grid explode (span/step
    * rows per key — bounded by the data's time window), one left join
    * back, one per-key ordered window for the fill. Everything shards
    * by the key column. */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, unit: String = "hour"): DataFrame = {
    require(Units.contains(unit.toLowerCase),
      s"resampleFill: unit must be one of $Units, got '$unit'")
    val u = unit.toLowerCase
    val agg = df
      .groupBy(col(keyCol), date_trunc(u, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode(expr(s"sequence(__mn, __mx, interval 1 $u)")).as("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(col(keyCol), col("bucket"),
      coalesce(col("n"), lit(0L)).as("n"),
      last(col("__s"), ignoreNulls = true).over(w).cast("double").as("filled"))
  }
}
