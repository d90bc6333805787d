package graft.pipeline

import org.apache.spark.sql.SparkSession

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
