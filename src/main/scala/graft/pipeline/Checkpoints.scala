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
