package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic release of `localCheckpoint` blocks in iterative loops.
  *
  * `Dataset.rdd.unpersist()` does NOT release a checkpoint's cached
  * blocks: `Dataset.rdd` wraps the internal checkpointed RDD[InternalRow]
  * in a fresh deserializing RDD, so unpersisting the wrapper releases
  * nothing (the round-8 Bpe loop did exactly that; block release silently
  * fell back to GC + ContextCleaner). The internal RDD is not publicly
  * reachable from the Dataset, but it IS registered in
  * `SparkContext.getPersistentRDDs` — so a driver-serial loop can snapshot
  * the persisted-id set before creating a checkpoint and later release
  * exactly the ids that appeared since, once the successor checkpoint has
  * materialized.
  *
  * Only valid for single-threaded loops: a concurrent persist from another
  * thread between snapshot and release would be misattributed and
  * unpersisted. Every graft call site (Bpe training, semanticDedup cell
  * splitting) is a driver-serial loop, and unpersist(blocking=false) on a
  * still-wanted block is recoverable anyway (recompute), never wrong.
  */
object Checkpoints {

  /** Durability-mode checkpoint — every iterative loop and shared-branch
    * materialization in graft stages its rounds through this instead of
    * calling `localCheckpoint` directly.
    *
    * `localCheckpoint` blocks live only in executor block managers: on a
    * real cluster a lost executor loses its blocks, and because the
    * checkpoint TRUNCATES lineage the job cannot recompute them — it
    * fails. On a 1000-executor run executor churn is routine, so
    * long iterative jobs (BPE training, graph rounds) need the RELIABLE
    * variant, which writes the checkpoint to fault-tolerant storage.
    * The knob is Spark's own: when `SparkContext.setCheckpointDir` has
    * been called (cluster deployments point it at DFS), this stages
    * through `Dataset.checkpoint`; otherwise it falls back to
    * `localCheckpoint` (single-node runs, tests, bench — no extra I/O).
    * Same laziness semantics either way, so the shared-materialization
    * guarantees (prefixFold's pid-assignment contract) hold in both
    * modes. Reliable-checkpoint FILES are only auto-deleted on GC when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; cluster
    * sessions should set it or clean the dir between jobs. */
  implicit final class DatasetCheckpointOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def stageCheckpoint(eager: Boolean): Dataset[T] =
      if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
        ds.checkpoint(eager)
      else ds.localCheckpoint(eager)
  }

  /** Run a driver-serial iterative loop with
    * `spark.sql.shuffle.partitions` derived from the loop's MEASURED
    * input rows instead of the session's core-count constant — the
    * Streams.withStatePartitions medicine applied to graph/doubling
    * loops (optimization guide §2, r17 measurement): a round over a
    * KB-sized frontier pays per-stage scheduling + AQE orchestration on
    * 32-way exchanges whose data coalesces to one task anyway; with the
    * partition count derived from the loop's own row count (~64k rows of
    * (long, long) state per partition) a gate-scale loop runs 1-2-way
    * and the per-round fixed cost stops multiplying. The derivation is
    * CAPPED at the session setting, so at cluster scale (rows/64k ≥ the
    * configured parallelism) the body runs exactly as before — this can
    * only narrow tiny rounds, never widen real ones. AQE is disabled
    * only when the derived count is ≤ 2: there is nothing for runtime
    * adaptivity to coalesce or split in a 1-2 partition exchange, and
    * its per-stage materialization is the dominant cost at that size
    * (measured: q_topo_layers warm 6.8 s → 4.8 s, jobs 185 → 80).
    * Restores both confs on exit. Driver-serial only, like the release
    * helpers below. */
  def withLoopShufflePartitions[A](spark: SparkSession, inputRows: Long)
                                  (body: => A): A = {
    val pKey = "spark.sql.shuffle.partitions"
    val aKey = "spark.sql.adaptive.enabled"
    val prevP = spark.conf.get(pKey)
    val prevA = spark.conf.get(aKey)
    val cap = try prevP.toLong catch { case _: NumberFormatException => 200L }
    val derived = math.max(1L, math.min(cap, inputRows / 65536L + 1))
    if (derived >= cap) body
    else {
      spark.conf.set(pKey, derived.toString)
      if (derived <= 2) spark.conf.set(aKey, "false")
      try body
      finally { spark.conf.set(pKey, prevP); spark.conf.set(aKey, prevA) }
    }
  }

  /** Snapshot of currently persisted RDD ids (caller-owned persists —
    * the release helpers never touch anything in this set). */
  def persistedIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Unpersist exactly the RDDs in `ids` (non-blocking). */
  def releaseIds(spark: SparkSession, ids: Set[Int]): Unit = {
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Ids persisted since `baseline`, excluding `known` — i.e. the blocks
    * belonging to the checkpoint a loop materialized most recently. */
  def freshIds(spark: SparkSession, baseline: Set[Int],
               known: Set[Int] = Set.empty): Set[Int] =
    persistedIds(spark) -- baseline -- known
}
