package graft.lifecycle

import org.apache.spark.sql.{DataFrame, Row}

/** Operation/Cursor-flavored facade for API parity with the reference's
  * pull model (SURVEY §3.1: Operation.CreateCursor → Cursor.Next(n) →
  * ResultView | EOS), layered over the plain DataFrame path.
  *
  * `Operation` is a lazy cursor factory (like operation.h:35-82);
  * `Cursor.next(n)` pulls up to n rows. The iteration runs through
  * `toLocalIterator`, which streams one partition at a time to the driver —
  * the whole result is never materialized at once, mirroring the
  * reference's block-at-a-time pull without breaking Spark's distributed
  * execution (each partition is still computed in parallel upstream).
  * `interrupt()` maps to Spark's job-group cancellation (cursor.h:150-186).
  */
final class Operation(val df: DataFrame) {
  /** Bind + create the cursor; analysis errors surface here, like the
    * reference's CreateCursor-time binding (operation.h:62). */
  def createCursor(): Cursor = {
    df.queryExecution.assertAnalyzed()
    new Cursor(df)
  }
}

final class Cursor(df: DataFrame) {
  /** Default block size mirrors the reference (cursor.h:133). */
  val defaultRowCount = 1024

  private val groupId = s"graft-cursor-${java.util.UUID.randomUUID}"
  private lazy val it: Iterator[Row] =
    df.toLocalIterator().asInstanceOf[java.util.Iterator[Row]].asScala
  private implicit class JIter[A](j: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = j.hasNext; def next() = j.next()
    }
  }

  def schema = df.schema

  /** Scope Spark jobs submitted by `body` to this cursor's job group, then
    * restore the thread's previous group — without the restore, unrelated
    * jobs submitted later on this thread would inherit the cursor's group
    * and be killed by interrupt(). */
  private def inGroup[A](body: => A): A = {
    val sc = df.sparkSession.sparkContext
    sc.setJobGroup(groupId, "graft cursor", interruptOnCancel = true)
    try body finally sc.clearJobGroup()
  }

  /** Pull the next block of up to maxRows rows; empty Seq = EOS
    * (reference ResultView EOS, cursor.h:42-122). */
  def next(maxRows: Int = defaultRowCount): Seq[Row] = inGroup {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (out.length < maxRows && it.hasNext) out += it.next()
    out.toSeq
  }

  def hasNext: Boolean = inGroup { it.hasNext }

  /** Async cancellation (reference Interrupt, cursor.h:150-186). A no-op
    * if no pull is in flight — like the reference, interruption takes
    * effect at the next processing boundary. */
  def interrupt(): Unit =
    df.sparkSession.sparkContext.cancelJobGroup(groupId)
}

object Lifecycle {
  def operation(df: DataFrame): Operation = new Operation(df)
}
