package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native `might_contain(key)` over a pre-built bloom filter — the probe
  * side of a bloom join (see Relational.bloomJoin).
  *
  * WHY CUSTOM: Spark's own runtime bloom pruning
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) is an optimizer
  * heuristic the user cannot direct at a specific join, and its
  * `might_contain` expression is internal (not SQL-registered). This
  * expression makes the probe explicit and composable: the filter is built
  * once (one aggregation over the build side), shipped to executors via the
  * codegen references array, and each probe-side key tests in O(numHashes)
  * bit reads inside whole-stage codegen — no shuffle, no join, no UDF.
  *
  * Holds the SERIALIZED filter (`filterBytes`) so the expression tree stays
  * cheaply comparable/copyable; the filter object deserializes lazily once
  * per JVM that evaluates it. False positives are expected (callers follow
  * with an exact join); false negatives are impossible — the contract the
  * spec pins.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${dt.sql}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any = {
    val k = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
    }
    filter.mightContainLong(k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized filter rides the generated class's references array
    // (BloomFilterImpl is java-serializable), so executors get the bits
    // once per task closure, not once per row.
    val f = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $f.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column face: true ⇔ the key is possibly in the filter (never a false
    * negative). NULL keys yield NULL, which a Filter drops — matching join
    * semantics where NULL keys never match. */
  def bloom_might_contain(key: Column, filter: BloomFilter): Column = {
    val bytes = new java.io.ByteArrayOutputStream()
    filter.writeTo(bytes)
    ColumnBridge.toColumn(
      BloomMightContainLong(ColumnBridge.toExpr(key), bytes.toByteArray))
  }
}
