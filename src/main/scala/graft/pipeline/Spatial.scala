package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial operators over integer planar coordinates —
  * the "find nearby points" primitive (geo dedup of scrape locations,
  * near-duplicate UI screenshots by layout coordinates, any 2-D
  * embedding). Integer coordinates and integer squared distances keep
  * every comparison exact on every engine — no floating-point boundary
  * flicker, which is what makes the radius join RECALL-EXACT provable
  * against an all-pairs oracle (the q_fuzzy_join standard).
  */
object Spatial {

  /** Floor division that is correct for negative values too (Spark's
    * integer `div` truncates toward zero): (x − pmod(x, d)) / d. The
    * numerator is an exact multiple of d, so the double division is
    * exact for |x| < 2^53 — cast back to long. */
  def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  /** All unordered point pairs within `radius` (inclusive, Euclidean):
    * (id_a < id_b, d2 = squared distance). Blocking: cells of side
    * `radius`; side A expands to its 3×3 cell neighborhood (a 9×
    * row expansion of ONE side — never an all-pairs product), side B
    * stays in its own cell, so every qualifying pair meets in exactly
    * one (cell, neighbor) combination: |Δx| ≤ r < 2·cell ⇒ the cells
    * differ by at most 1 per axis. Recall is therefore structural, not
    * probabilistic. Shuffles move (cell, id, x, y) tuples; per-cell
    * density is the data's own spatial density at radius scale — the
    * skew guard is the cell size, which equals the query radius. */
  def radiusJoinGrid(points: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    require(radius >= 1, "radiusJoinGrid: radius must be >= 1")
    val p = points.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"),
      floorDiv(col(xCol).cast("long"), radius).as("__cx"),
      floorDiv(col(yCol).cast("long"), radius).as("__cy"))
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val a = p.withColumn("__o", explode(offsets))
      .select(col("__id").as("id_a"), col("__x").as("xa"), col("__y").as("ya"),
        (col("__cx") + col("__o.dx")).as("__jx"),
        (col("__cy") + col("__o.dy")).as("__jy"))
    val b = p.select(col("__id").as("id_b"), col("__x").as("xb"),
      col("__y").as("yb"), col("__cx").as("__jx"), col("__cy").as("__jy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
             (col("ya") - col("yb")) * (col("ya") - col("yb"))
    a.join(b, Seq("__jx", "__jy"))
      .where(col("id_a") < col("id_b") && d2 <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), d2.as("d2"))
  }
}
