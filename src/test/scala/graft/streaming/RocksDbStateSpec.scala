package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Production state-store posture: at 100 TB the HDFS-backed default
  * provider holds every key's state in executor heap, which caps streaming
  * state at JVM size; the RocksDB provider (bundled with Spark) keeps state
  * off-heap/on-disk and is the large-state deployment choice. These tests
  * run the SAME two-phase gate harness (run → checkpoint-resume) under
  * `RocksDBStateStoreProvider` and pin that committed output is identical
  * to the default provider's, across the two distinct state shapes the
  * engine uses: arbitrary keyed state (flatMapGroupsWithState sessionize)
  * and streaming-aggregation state (watermarked tumbling windows). The
  * provider is a pure deployment knob — semantics must not move. */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def work(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run `gate` once under the session-default provider and once under
    * RocksDB (fresh checkpoints each — providers are not checkpoint-
    * compatible), restore the conf, and return both committed row sets. */
  private def underBothProviders(gate: String => org.apache.spark.sql.DataFrame)
      : (Set[Seq[Any]], Set[Seq[Any]]) = {
    val prev = spark.conf.getOption(ProviderKey)
    val default = rows(gate(work("graft-hdfs-state-"))).toSet
    try {
      spark.conf.set(ProviderKey, RocksDb)
      val rocks = rows(gate(work("graft-rocksdb-state-"))).toSet
      (default, rocks)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("sessionize gate (flatMapGroupsWithState keyed state): RocksDB == default provider through checkpoint resume") {
    val (default, rocks) = underBothProviders(dir =>
      Streams.sessionizeStreamGate(spark, sf(), dir, gapMs = 30 * 60 * 1000L))
    assert(rocks.nonEmpty, "gate committed no sessions")
    assert(rocks == default, "RocksDB provider changed sessionize output")
  }

  test("windowed-agg gate (streaming aggregation state): RocksDB == default provider through checkpoint resume") {
    val (default, rocks) = underBothProviders(dir =>
      Streams.windowedStreamGate(spark, sf(), dir))
    assert(rocks.nonEmpty, "gate committed no windows")
    assert(rocks == default, "RocksDB provider changed windowed-agg output")
  }

  test("near-dedup gate (per-bucket flatMapGroupsWithState): RocksDB == default provider through checkpoint resume") {
    val (default, rocks) = underBothProviders(dir =>
      Streams.nearDedupStreamGate(spark, sf(), dir,
        threshold = 0.7, numHashes = 48, bands = 24, shingleLen = 3))
    assert(rocks.nonEmpty, "gate committed no pairs")
    assert(rocks == default, "RocksDB provider changed near-dedup output")
  }
}
