package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed shard manifests for training-data reproducibility:
  * assign every row to a deterministic shard, and summarize each shard
  * with a row count and an ORDER-INDEPENDENT content fingerprint, so a
  * rebuilt dataset can be verified shard-by-shard against the manifest
  * without re-reading the original (the integrity face of
  * Relational.fileOutputPartitioned's size-targeted writer).
  * Beyond-reference surface.
  *
  * Portability: the row fingerprint is the top 60 bits of md5 over the
  * sentinel-joined column values (the same md5-prefix trick as
  * PortableSimHash60), and the shard fingerprint folds row fingerprints
  * with BIT_XOR — commutative and associative, so partition order,
  * shuffle order, and parallelism cannot perturb it, and ANY engine
  * (DuckDB included — see the q_shard_manifest oracle) can recompute it.
  *
  * Scale shape: one codegen projection per row + one partial/final
  * aggregation keyed by shard — a single shuffle of (shard, 8-byte fp)
  * pairs; no driver-side state.
  */
object Shards {

  /** Unit separator / NULL sentinel for the canonical row encoding:
    * tokens that cannot appear in the data (control chars) so the
    * encoding is injective for text-free-of-control-chars columns. */
  private val Sep = "\u0001"
  private val NullMark = "\u0000"

  /** Canonical string encoding of a row's columns (NULL-safe). */
  def rowEncoding(cols: Seq[Column]): Column =
    concat_ws(Sep, cols.map(c => coalesce(c.cast("string"), lit(NullMark))): _*)

  /** 60-bit portable row fingerprint: top 15 hex chars of md5 of the
    * canonical encoding, parsed base-16 (non-negative, engine-agnostic). */
  def rowFingerprint60(cols: Seq[Column]): Column =
    conv(substring(md5(rowEncoding(cols)), 1, 15), 16, 10).cast("long")

  /** Deterministic shard id in [0, nShards) from the KEY columns (hash
    * of the canonical key encoding — reproducible across runs/engines,
    * unlike hash-partitioner internals). */
  def assignShard(keyCols: Seq[Column], nShards: Int): Column = {
    require(nShards > 0, "assignShard: nShards must be positive")
    pmod(rowFingerprint60(keyCols), lit(nShards.toLong)).cast("int")
  }

  /** Manifest: one row per shard — (shard, n_rows, content_fp) where
    * content_fp = BIT_XOR of every row's fingerprint over `valueCols`.
    * Rebuilding the dataset and re-running shardManifest must reproduce
    * the manifest EXACTLY; any lost, duplicated, or corrupted row flips
    * the count and/or the xor-fold. (A row duplicated an EVEN number of
    * times xor-cancels in content_fp — the count catches it; the pair of
    * checks together is the integrity contract.) */
  def shardManifest(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
                    nShards: Int): DataFrame = {
    require(valueCols.nonEmpty, "shardManifest: need value columns")
    df.select(
        assignShard(keyCols.map(col), nShards).as("shard"),
        rowFingerprint60(valueCols.map(col)).as("__fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__fp)").as("content_fp"))
  }
}
