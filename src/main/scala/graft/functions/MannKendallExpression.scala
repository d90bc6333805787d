package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mann-Kendall S statistic over a TIME-ORDERED array of (exactly
  * comparable) long values: S = Σ_{i<j} sgn(v_j − v_i), computed as
  * C(n,2) − tiePairs − 2·inversions with a merge-sort inversion count —
  * O(n log n) per series instead of the O(n²) pairwise self-join form.
  * The identity: pairs split into up (+1), down (−1), tie (0); up =
  * C(n,2) − inversions − tiePairs and down = inversions, so
  * S = up − down = C(n,2) − tiePairs − 2·inversions. Equal values merge
  * left-first (no inversion counted), exactly sgn's tie behaviour.
  *
  * WHY (r16, measured): the pairwise form joins the daily table to
  * itself on the GROUP key — a handful of distinct keys, so the whole
  * quadratic fan-out lands on that many tasks (q_mann_kendall: 14M
  * comparison rows in ≤5 tasks, ~3 s at sf0.1 — and per-key n² at any
  * scale). A calendar-bounded series fits one row trivially; the kernel
  * is exact integer arithmetic, so the same DuckDB oracle (which still
  * replays the pairwise definition) pins the equivalence. */
case class MannKendallS(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mann_kendall_s requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MannKendallS.statistic(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MannKendallS.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.statistic($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MannKendallS {
  def statistic(arr: ArrayData): Long = {
    val n = arr.numElements()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) { v(i) = arr.getLong(i); i += 1 }
    val total = n.toLong * (n - 1) / 2
    // tie pairs from a sorted copy's equal runs
    val sorted = java.util.Arrays.copyOf(v, n)
    java.util.Arrays.sort(sorted)
    var ties = 0L
    var r = 0
    while (r < n) {
      var e = r
      while (e + 1 < n && sorted(e + 1) == sorted(r)) e += 1
      val t = (e - r + 1).toLong
      ties += t * (t - 1) / 2
      r = e + 1
    }
    total - ties - 2L * inversions(v, new Array[Long](n), 0, n - 1)
  }

  /** #{i<j : v_i > v_j} by merge sort; equal values merge left-first. */
  private def inversions(a: Array[Long], tmp: Array[Long], lo: Int, hi: Int): Long = {
    if (lo >= hi) return 0L
    val mid = lo + (hi - lo) / 2
    var inv = inversions(a, tmp, lo, mid) + inversions(a, tmp, mid + 1, hi)
    var i = lo; var j = mid + 1; var k = lo
    while (i <= mid && j <= hi) {
      if (a(j) < a(i)) { inv += (mid - i + 1).toLong; tmp(k) = a(j); j += 1 }
      else { tmp(k) = a(i); i += 1 }
      k += 1
    }
    while (i <= mid) { tmp(k) = a(i); i += 1; k += 1 }
    while (j <= hi) { tmp(k) = a(j); j += 1; k += 1 }
    System.arraycopy(tmp, lo, a, lo, hi - lo + 1)
    inv
  }

  /** Column API: S over a time-ordered array<bigint> series. */
  def mann_kendall_s(values: Column): Column =
    ColumnBridge.toColumn(MannKendallS(ColumnBridge.toExpr(values)))
}
