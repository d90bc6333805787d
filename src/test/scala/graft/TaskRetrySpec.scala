package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.pipeline.{Profile, Sampling}

/** Injected-failure counter. Object-held so the closure running inside
  * local-mode executor threads and the assertion in the driver see the
  * same instance. */
object RetryFault {
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Task-RETRY determinism — the sibling of ReliableCheckpointSpec's
  * executor-churn durability. On a 1000-executor cluster individual task
  * attempts fail routinely (preemption, OOM-kill, disk faults) and Spark
  * recomputes them; a result is only correct at scale if recomputed
  * attempts produce the SAME rows. The classic killers are
  * nondeterministic upstreams feeding a shuffle — `rand()`,
  * `monotonically_increasing_id`, unstable partition ids — which this
  * repo bans by design (hash-keyed sampling, prefixFold's checkpointed
  * `__pid` contract). This spec makes that posture a unit failure: the
  * shared session runs `local[4, 4]` (maxFailures 4, real retry
  * semantics), a fault stage throws on every first attempt of one
  * partition, and each primitive's output must be bit-identical to its
  * clean run — with the injection verified to have actually fired.
  */
class TaskRetrySpec extends SparkSpec {

  /** The frame with a fail-once stage underneath: partition 1's first
    * attempt always throws; the retry (attempt 1) passes rows through
    * untouched. Every job that recomputes the stage pays (and survives)
    * a fresh injected failure. */
  def faulty(df: DataFrame): DataFrame = staged(df, fail = true)

  /** Identical plan shape (repartition + RDD pass-through stage) WITHOUT
    * the throw — the clean reference MUST share the hurt side's physical
    * plan, or the comparison conflates retry-determinism with
    * plan-invariance (e.g. float partial-agg grouping differences). */
  def passthrough(df: DataFrame): DataFrame = staged(df, fail = false)

  private def staged(df: DataFrame, fail: Boolean): DataFrame = {
    val schema = df.schema
    val rdd = df.repartition(4).rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (fail && tc != null && tc.partitionId() == 1 &&
          tc.attemptNumber() == 0) {
        RetryFault.injected.incrementAndGet()
        throw new RuntimeException("TaskRetrySpec: injected task failure")
      }
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  private def lineitem: DataFrame =
    spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  // by-name: the reset must precede CONSTRUCTION of the hurt frame, not
  // just its collect — under AQE a checkpointing primitive (prefixFold)
  // executes its shuffle stages eagerly at toRdd, inside construction
  private def assertSame(clean: => DataFrame, hurt: => DataFrame): Unit = {
    val want = clean.collect().toSeq.map(_.toSeq)
    RetryFault.injected.set(0)
    val got = hurt.collect().toSeq.map(_.toSeq)
    assert(RetryFault.injected.get() > 0, "fault never fired — test is vacuous")
    assert(got == want)
  }

  test("shuffle-map retry: groupBy aggregate identical after injected failure") {
    def agg(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assertSame(agg(passthrough(lineitem)), agg(faulty(lineitem)))
  }

  test("prefixFold global positions identical after injected failure") {
    // rowPositions over tied sort keys is arbitrary-but-valid per its
    // contract, so give it a TOTAL key: distinct single-column ids
    def ids = lineitem.select(concat_ws("#", col("l_orderkey"),
      col("l_linenumber"), col("l_quantity")).as("id")).distinct()
    def pos(df: DataFrame) = Profile.rowPositions(df, "pos", col("id"))
      .orderBy("id")
    assertSame(pos(passthrough(ids)), pos(faulty(ids)))
  }

  test("deterministicShuffle replays the identical global order through a retry") {
    def shuffled(df: DataFrame) = Sampling.deterministicShuffle(
        df.select(concat_ws("#", col("l_orderkey"), col("l_linenumber"))
          .as("id")), Seq("id"), seed = 42L)
    assertSame(shuffled(passthrough(lineitem)), shuffled(faulty(lineitem)))
  }

  test("write-path retry: a task failure mid-write neither drops nor duplicates rows") {
    // the classic double-write hazard — a failed write attempt's file
    // must not be committed alongside the retry's. Spark's commit
    // protocol promises exactly-once per task; pin it under injection.
    val dir = java.nio.file.Files.createTempDirectory("graft_retry_write")
      .resolve("out").toString
    val want = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q")).orderBy("l_returnflag")
      .collect().toSeq.map(_.toSeq)
    RetryFault.injected.set(0)
    graft.operators.Relational.fileOutput(faulty(lineitem), dir)
    assert(RetryFault.injected.get() > 0, "fault never fired — test is vacuous")
    val got = spark.read.parquet(dir).groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q")).orderBy("l_returnflag")
      .collect().toSeq.map(_.toSeq)
    assert(got == want)
  }

  test("reduce-side retry: failure injected AFTER the exchange") {
    // the faulty stage consumes shuffle output, so the retried attempt
    // re-fetches map output blocks rather than recomputing the scan
    def top(df: DataFrame) = df.orderBy(desc("q"), asc("l_returnflag"))
    val agg = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"))
    assertSame(top(passthrough(agg)), top(faulty(agg)))
  }
}
