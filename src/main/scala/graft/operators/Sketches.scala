package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch aggregations — the profiling operations a 100 TB
  * training-data pipeline runs where exact answers would shuffle the
  * world: distinct counts (HyperLogLog++), quantiles (Greenwald-Khanna
  * style percentile_approx), and per-key frequencies (count-min sketch).
  *
  * Capability superset: the reference has no sketch operators (SURVEY
  * §2.8). All three are single-pass aggregations with MERGEABLE partials
  * and fixed memory — the map-side combine + final merge shape that makes
  * them linear at cluster scale (same partial/final split as
  * BestEffortGroupAggregate).
  *
  * Correctness gating: sketch outputs are implementation-defined, so the
  * gate queries emit the EXACT value (computed alongside) plus a
  * within-tolerance boolean on the sketch estimate; the oracle recomputes
  * the exact value and asserts the boolean — the accuracy CONTRACT is
  * verified without demanding cross-engine sketch bit-parity.
  */
object Sketches {

  /** HLL++ distinct count per group, with the exact count and a relative-
    * error check attached. `rsd` is the target relative standard
    * deviation; the gate bound (default 5·rsd) holds w.h.p. */
  def approxDistinctWithCheck(df: DataFrame, keys: Seq[String], valueCol: String,
                              rsd: Double = 0.02, bound: Double = 0.10): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("nd_exact"),
        approx_count_distinct(col(valueCol), rsd).as("nd_approx"))
      .withColumn("nd_ok",
        abs(col("nd_approx") - col("nd_exact")) <=
          greatest(col("nd_exact") * bound, lit(1.0)))

  /** Approximate quantiles per group (percentile_approx, GK-style sketch)
    * next to exact interpolated percentiles; ok-flags bound the rank
    * error. `accuracy` is Spark's 1/eps knob (10000 ⇒ ±0.01 % rank). */
  def approxQuantilesWithCheck(df: DataFrame, keys: Seq[String], valueCol: String,
                               probs: Seq[Double], accuracy: Int = 10000,
                               valueTol: Double = 1.0): DataFrame = {
    val p = array(probs.map(lit): _*)
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), p, lit(accuracy)).as("q_approx"),
        expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("q_exact"))
      .withColumn("q_ok",
        forall(zip_with(col("q_approx"), col("q_exact"),
          (a, e) => abs(a - e) <= valueTol), x => x))
  }

  /** Count-min sketch of `keyCol` frequencies. Returns the serialized
    * sketch (one small binary — index metadata, like IVF centroids). */
  def countMinSketch(df: DataFrame, keyCol: String,
                     eps: Double = 0.0001, confidence: Double = 0.99,
                     seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)

  /** Per-key frequency check: exact top-k key counts joined with their
    * count-min estimates. CMS guarantees est ≥ exact and
    * est ≤ exact + eps·N w.h.p.; `freq_ok` asserts exactly that. The
    * sketch probe runs on the driver over k keys only (the sketch and the
    * key list are index-sized; the counting itself is distributed). */
  def topKFrequencyWithCheck(df: DataFrame, keyCol: String, k: Int,
                             eps: Double = 0.0001): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = df.sparkSession
    val n = df.count()
    val sketch = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(countMinSketch(df, keyCol, eps)))
    // NULL keys are invisible to the sketch (the aggregate skips them, the
    // standard sketch contract), so they are excluded from the top-k too.
    val top = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol)).limit(k).collect()
    val bound = (eps * n).ceil.toLong
    // Probe with the SAME runtime shape the aggregate hashed: integral types
    // hash as long, strings as their UTF-8 bytes — estimateCount dispatches
    // on the probe's runtime class, so an Int probe must widen to Long.
    val out = top.toSeq.map { r =>
      val key = r.get(0)
      val exact = r.getLong(1)
      val est = key match {
        case s: String => sketch.estimateCount(s)
        case i: java.lang.Number => sketch.estimateCount(java.lang.Long.valueOf(i.longValue()))
        case other => sketch.estimateCount(other) // binary etc. — sketch's own dispatch
      }
      Row(key, exact, est, est >= exact && est <= exact + bound)
    }
    val schema = StructType(Seq(
      df.schema(keyCol),
      StructField("n_exact", LongType, nullable = false),
      StructField("n_est", LongType, nullable = false),
      StructField("freq_ok", BooleanType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }
}
