package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-profiling report: per-column null counts, distinct counts, numeric
  * ranges, and string-length stats in ONE aggregation pass — the
  * "describe your 100 TB table" operator a pipeline runs before training.
  * Beyond-reference surface (the reference has no profiling operator).
  *
  * The wide aggregate computes every column's metrics in a single scan;
  * the per-column rows are then unpivoted from the 1-row result with a
  * stack projection (driver-free — the 1×(7·cols) row never leaves the
  * executors).
  */
object Profile {

  /** Profile `cols` of `df`. Output: one row per column —
    * (col_name, n_nonnull, n_null, n_distinct, min_num, max_num, avg_len) —
    * min/max_num are NULL for non-numeric columns, avg_len is NULL for
    * non-string columns.
    *
    * `exactDistinct = true` uses COUNT(DISTINCT) — Catalyst's multi-
    * distinct rewrite EXPANDS the input ×cols, the right trade at gate
    * scale. At 100 TB profile breadth, pass false for HyperLogLog++
    * (`rsd` relative error): single pass, no expansion, fixed memory —
    * the same partial/final mergeable-sketch shape as Sketches. */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val isStr = df.schema(c).dataType == StringType
      val nd = if (exactDistinct) count_distinct(col(c))
               else approx_count_distinct(col(c), rsd)
      Seq(
        count(col(c)).as(s"__nn_$c"),
        // coalesce: SUM over zero rows is NULL, but "0 nulls" is the
        // truthful report for an empty input
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nl_$c"),
        nd.as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as(s"__mn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as(s"__mx_$c"),
        (if (isStr) avg(length(col(c))) else lit(null).cast("double")).as(s"__al_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nl_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__al_$c").as("avg_len"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Winsorize: clamp a numeric column to its [pLo, pHi] percentiles —
    * the outlier-capping step before training on heavy-tailed features.
    * The two percentiles ride a broadcast 1-row aggregate (one extra
    * pass), then the clamp itself is a pure codegen projection. Output
    * replaces `valueCol` with the clamped value (NULLs pass through
    * unclamped).
    *
    * `exact = true` uses the exact interpolating `percentile` aggregate
    * (cross-engine-identical to DuckDB's quantile_cont — what the gate
    * verifies) — but it BUFFERS every value in the aggregation state, so
    * at 100 TB pass false for the GK-sketch `approx_percentile`
    * (`accuracy` = 1/eps): fixed memory, mergeable partials, bounds off
    * by at most the rank error — harmless for outlier capping. */
  def winsorize(df: DataFrame, valueCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99,
                exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, "winsorize: need 0 <= pLo <= pHi <= 1")
    val fn = if (exact) "percentile" else "approx_percentile"
    val acc = if (exact) "" else s", $accuracy"
    // ONE array-percentile aggregate: both bounds share a single value
    // buffer / sketch — two scalar percentile aggs each buffer the whole
    // column independently (measured ~2x on the exact path at sf0.1)
    val bounds = df.agg(
      expr(s"$fn(`$valueCol`, array($pLo, $pHi)$acc)").as("__b"))
      .select(col("__b")(0).as("__lo"), col("__b")(1).as("__hi"))
    // NULL guard: Spark's greatest/least SKIP nulls (they don't propagate
    // them), so an unguarded clamp would silently turn NULL into the lower
    // bound — NULLs must pass through as NULLs
    val clamped = when(col(valueCol).isNotNull,
      least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
    df.crossJoin(broadcast(bounds))
      .withColumn(valueCol, clamped)
      .drop("__lo", "__hi")
  }

  /** Equi-width histogram over [lo, hi): one codegen projection + one
    * partial/final count aggregation keyed by bin — the column-
    * distribution profile at any scale. Out-of-range mass is KEPT, not
    * dropped: values below lo land in bin −1, values ≥ hi in bin
    * `nBins`, so Σn equals the non-NULL row count (mass conservation is
    * what makes a histogram trustworthy); NULLs get a NULL bin. The bin
    * arithmetic is plain floor((v−lo)·nBins/(hi−lo)) — deliberately NOT
    * width_bucket(), which not every engine ships — so the q_histogram
    * oracle replays it textually, and IEEE double ops make boundary
    * assignment identical across engines. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0, "histogram: nBins must be positive")
    require(hi > lo, "histogram: need hi > lo")
    val v = col(valueCol).cast("double")
    val bin = when(v.isNull, lit(null).cast("long"))
      .when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBins.toLong))
      .otherwise(floor((v - lit(lo)) * lit(nBins) / (lit(hi) - lit(lo))))
    df.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("n"))
  }
}
