package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native skip-gram pair GENERATOR: from a token array, emit one
  * (center, context) row for every position pair 0 < |i−j| ≤ window —
  * the word2vec training-pair expansion as a first-class Catalyst
  * generator.
  *
  * WHY CUSTOM: the composable form — explode(flatten(transform(sequence,
  * i -> filter(transform(offsets, ...))))) — allocates, per document,
  * a struct per candidate pair plus three intermediate arrays (inner
  * transform, filter survivor list, flatten copy), all driven by
  * interpreted lambda closures. This generator walks the token array
  * once per emitted row with ZERO intermediate structures: each output
  * row is two UTF8String references into the already-materialized token
  * array. Generators run in GenerateExec, so the expansion streams —
  * the 2·w·n output never exists as one in-memory array at all, where
  * the HOF form materializes the whole per-document pair list before
  * explode unpacks it. Pair VALUES are asserted identical to the HOF
  * form (SessionTextOpsSpec property).
  */
case class SkipgramGenerate(child: Expression, window: Int)
  extends Generator with CodegenFallback with UnaryLike[Expression] {

  require(window >= 1, "skipgram_generate: window must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("center", StringType, nullable = true),
    StructField("context", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"skipgram_generate requires array<string> tokens, got ${other.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 2) return Nil
    new Iterator[InternalRow] {
      // iterate (center i, offset index) lazily; o ranges over the
      // 2·window offsets with 0 skipped
      private var i = 0
      private var o = -window
      advance()
      private def valid: Boolean =
        o != 0 && i + o >= 0 && i + o < n
      private def advance(): Unit = {
        while (i < n && !valid) {
          o += 1
          if (o > window) { o = -window; i += 1 }
        }
      }
      override def hasNext: Boolean = i < n
      override def next(): InternalRow = {
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        row.update(0, a.getUTF8String(i))
        row.update(1, a.getUTF8String(i + o))
        o += 1
        if (o > window) { o = -window; i += 1 }
        advance()
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
