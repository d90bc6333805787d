package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Stateful "running" expressions (supersonic/expression/core/
  * stateful_expressions.h:39-69) — the reference's window-function
  * substitute, where state persists across blocks of a single ordered
  * stream.
  *
  * A distributed engine has no implicit stream order, so every operation
  * here takes an explicit partition + order (documented semantic gap,
  * SURVEY §2.7). The partition keys are what make these scale: state never
  * crosses a partition boundary, so a 100 TB stream keyed by user shards
  * across the cluster instead of funneling into one task. An empty
  * partitionBy reproduces the reference's single-stream semantics exactly
  * (at the cost of a single-task window — flagged by Spark's
  * WindowExec warning).
  */
object Stateful {

  private def w(partition: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)

  private def running(partition: Seq[Column], order: Seq[Column]): WindowSpec =
    w(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Changed — true iff the value differs from the previous row's (first row
    * true) (stateful_expressions.h:38-44). */
  def changed(c: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val prev = lag(c, 1).over(w(partition, order))
    val rn = row_number().over(w(partition, order))
    rn === 1 || !(prev <=> c)
  }

  /** RunningSum — prefix sum ignoring NULLs; NULL until the first non-null
    * input (stateful_expressions.h:46-50). */
  def runningSum(c: Column, partition: Seq[Column], order: Seq[Column]): Column =
    sum(c).over(running(partition, order))

  /** Smudge — last observation carried forward
    * (stateful_expressions.h:52-56). */
  def smudge(c: Column, partition: Seq[Column], order: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(running(partition, order))

  /** RunningMinWithFlush — running min that resets whenever `flush` is true
    * (stateful_expressions.h:58-62). Sessionized by a running flush counter,
    * then min within the session. Returns a DataFrame transform because two
    * window passes are needed. */
  def runningMinWithFlush(df: DataFrame, input: Column, flush: Column, out: String,
                          partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val sess = sum(when(flush, 1).otherwise(0)).over(running(partition, order))
    df.withColumn("__sess", sess)
      .withColumn(out, min(input).over(running(partition :+ col("__sess"), order)))
      .drop("__sess")
  }

  /** SmudgeIf — carry the previous output forward while `cond` is true
    * (stateful_expressions.h:64-69). Rows where cond is false start a new
    * carry group; within a group the first row's value propagates. */
  def smudgeIf(df: DataFrame, input: Column, cond: Column, out: String,
               partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val grp = sum(when(cond, 0).otherwise(1)).over(running(partition, order))
    df.withColumn("__grp", grp)
      .withColumn(out, first(input).over(
        Window.partitionBy((partition :+ col("__grp")): _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__grp")
  }
}
