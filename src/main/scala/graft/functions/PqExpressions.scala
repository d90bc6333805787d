package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native nearest-sub-centroid assignment for product quantization:
  * argmin over s of `dot(c_s, c_s) − 2·dot(x, c_s)`, ties to the LOWER
  * index — bit-identical to the composed form it replaces
  * (`least(struct(vec_dot(cLit,cLit) − 2·vec_dot(sub,cLit), s)...)`):
  * the same ascending sequential-fold dot kernel as
  * [[VectorDot]] (so float results agree to the last ulp), the same
  * `cc − 2.0·dp` evaluation order, and the same double comparison
  * semantics as Spark's struct ordering (java.lang.Double.compare: ties
  * keep the first = lowest index, NaN greatest, −0.0 < 0.0).
  *
  * WHY CUSTOM (r16, measured): the composed form embeds ksub codebook
  * literal arrays and 2·ksub dot folds into the expression TREE, per
  * subspace — and trained-PQ rebuilds the tree with fresh literals every
  * Lloyd round, so every round re-plans and re-compiles a huge codegen
  * unit (the q_ann_pq_trained wall was dominated by per-round planning/
  * compilation, not arithmetic). Here the codebook rides along as a
  * referenced object and the generated code is one small static call. */
case class PqAssignCodeExpr(child: Expression, books: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(books.nonEmpty, "pq_assign_code: need at least one codebook entry")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_assign_code requires array<double>, got ${other.sql}")
  }

  // The codebook field is an immutable IndexedSeq so case-class equality
  // (and thus Catalyst semanticEquals / canonicalization) is structural,
  // and no caller can mutate a shared array after planning; the eval /
  // codegen kernels read this derived primitive form.
  @transient private lazy val booksArr: Array[Array[Double]] =
    books.map(_.toArray).toArray

  // dot(c_s, c_s) precomputed with the SAME ascending fold the literal
  // expression's constant folding used — bit-identical
  @transient private lazy val cc: Array[Double] = PqAssignCodeExpr.selfDots(booksArr)

  override def nullSafeEval(input: Any): Any =
    PqAssignCodeExpr.assign(input.asInstanceOf[ArrayData], booksArr, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqAssignCodeExpr.getClass.getName.stripSuffix("$")
    val booksRef = ctx.addReferenceObj("pqBooks", booksArr, "double[][]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.assign($a, $booksRef, $ccRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAssignCodeExpr {
  def selfDots(books: Array[Array[Double]]): Array[Double] =
    books.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  def assign(x: ArrayData, books: Array[Array[Double]], cc: Array[Double]): Int = {
    var best = 0
    var bestD = dist(x, books(0), cc(0))
    var s = 1
    while (s < books.length) {
      val d = dist(x, books(s), cc(s))
      if (java.lang.Double.compare(d, bestD) < 0) { best = s; bestD = d }
      s += 1
    }
    best
  }

  private def dist(x: ArrayData, c: Array[Double], cc: Double): Double = {
    val n = math.min(x.numElements(), c.length)
    var dp = 0.0; var i = 0
    while (i < n) { dp += x.getDouble(i) * c(i); i += 1 }
    cc - 2.0 * dp
  }

  /** Column API: nearest codebook index for an array<double> subvector.
    * The rows are copied into immutable IndexedSeqs at construction so the
    * expression owns its codebook (see the field note above). */
  def pq_assign_code(sub: Column, books: Array[Array[Double]]): Column =
    ColumnBridge.toColumn(PqAssignCodeExpr(ColumnBridge.toExpr(sub),
      books.map(_.toIndexedSeq).toIndexedSeq))
}
