package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact-integer Viterbi segmentation for the unigram-LM tokenizer
  * (pipeline.Unigram): given a word length and the scored piece
  * candidates covering it, return the optimal segmentation.
  *
  * Objective (ALL integer — no log-probability doubles, so Spark and the
  * DuckDB oracle replay bit-identically): minimize
  * `pieces * 2^52 - sum(piece scores)` — fewest pieces first, then
  * highest frequency mass. Ties broken by the backward walk choosing the
  * SMALLEST last-piece length at every step, which equals the
  * lexicographically smallest REVERSED piece-length sequence among
  * minimum-cost segmentations (the form the oracle can rank with a plain
  * ORDER BY cost, list_reverse(lens)).
  *
  * Scores must stay below 2^52 / maxWordLen for the packed cost to order
  * correctly — corpus token counts (the scores) are far below that at any
  * realistic scale (2^47 tokens = 100 trillion).
  *
  * WHY CUSTOM: the DP is sequential over word positions with a backward
  * argmin walk — inexpressible as a codegen-friendly HOF chain without
  * materializing O(len^2) intermediate arrays per row. One invocation per
  * DISTINCT word (the training working set), all JVM-local work.
  */
case class UnigramViterbi(left: Expression, right: Expression, maxPieceLen: Int)
    extends BinaryExpression {

  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    "unigram_viterbi: maxPieceLen must be in 1..16")

  private val pieceStruct = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("k", IntegerType, nullable = false)))

  override def dataType: DataType = ArrayType(pieceStruct, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(StructType(Array(
      StructField("j", IntegerType, _, _),
      StructField("k", IntegerType, _, _),
      StructField("score", LongType, _, _))), _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi requires (int wordLen, array<struct<j:int,k:int,score:bigint>>), got $other")
  }

  override def nullSafeEval(lenAny: Any, candsAny: Any): Any =
    UnigramViterbi.segment(lenAny.asInstanceOf[Int],
      candsAny.asInstanceOf[ArrayData], maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnigramViterbi.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (len, cands) =>
      s"${ev.value} = $cls.segment($len, $cands, $maxPieceLen);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UnigramViterbi {
  /** Cost packing: pieces * Big - sumScore; Big dominates any score sum. */
  val Big: Long = 1L << 52

  def segment(len: Int, cands: ArrayData, maxPieceLen: Int): ArrayData = {
    val Absent = Long.MinValue
    // score(j)(k): piece starting at 0-based j, length k
    val score = Array.fill(len + 1, maxPieceLen + 1)(Absent)
    var i = 0
    val n = cands.numElements()
    while (i < n) {
      val s = cands.getStruct(i, 3)
      val j = s.getInt(0); val k = s.getInt(1)
      if (j >= 0 && k >= 1 && k <= maxPieceLen && j + k <= len)
        score(j)(k) = s.getLong(2)
      i += 1
    }
    val NoPath = Long.MaxValue
    val cost = Array.fill(len + 1)(NoPath)
    cost(0) = 0L
    var pos = 1
    while (pos <= len) {
      var k = 1
      while (k <= maxPieceLen && k <= pos) {
        if (score(pos - k)(k) != Absent && cost(pos - k) != NoPath) {
          val c = cost(pos - k) + Big - score(pos - k)(k)
          if (c < cost(pos)) cost(pos) = c
        }
        k += 1
      }
      pos += 1
    }
    if (cost(len) == NoPath)
      throw new IllegalArgumentException(
        s"unigram_viterbi: word of length $len not segmentable — the vocabulary " +
          "must contain every single character")
    // backward walk, smallest k first (the pinned tie-break)
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    pos = len
    while (pos > 0) {
      var k = 1
      var chosen = -1
      while (chosen < 0 && k <= maxPieceLen && k <= pos) {
        if (score(pos - k)(k) != Absent && cost(pos - k) != NoPath &&
            cost(pos - k) + Big - score(pos - k)(k) == cost(pos)) chosen = k
        else k += 1
      }
      out += new GenericInternalRow(Array[Any](pos - chosen, chosen))
      pos -= chosen
    }
    new GenericArrayData(out.reverse.toArray)
  }
}

object UnigramViterbiExpression {
  /** Column API: optimal unigram segmentation of a word. */
  def unigram_viterbi(wordLen: Column, candidates: Column, maxPieceLen: Int): Column =
    ColumnBridge.toColumn(UnigramViterbi(
      ColumnBridge.toExpr(wordLen), ColumnBridge.toExpr(candidates), maxPieceLen))
}
