package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination check: for each test document, what fraction
  * of its word n-grams appears anywhere in the training corpus — the
  * benchmark-leakage audit every LLM training pipeline runs before
  * shipping an eval set. Beyond-reference surface.
  *
  * Scale shape: shingles are 64-bit hashes the moment they leave the
  * per-document projection (Dedup.withShingleSet machinery — tokenization
  * staged behind a repartition barrier so split() runs once per doc, not
  * once per shingle), so the join shuffles (id, 8-byte hash) pairs, never
  * text. The train side dedupes to DISTINCT hashes first — the heavy
  * reduction happens map-side before the join — and the final counts are
  * a per-test-doc aggregation. No driver collect anywhere.
  */
object Contamination {

  /** Per-test-document n-gram overlap with the training corpus.
    * Output: (idCol, n_shingles, n_hit, rate) — one row per test doc with
    * ≥ 1 shingle (docs shorter than `n` tokens have no n-grams and are
    * absent, mirroring "nothing to leak").
    *
    * Hash-join caveat (shared with Dedup): shingles compare by xxhash64,
    * so a 2^-64 collision could count a false hit — the standard
    * at-scale trade (exact-string verify would shuffle text). */
  def ngramContamination(train: DataFrame, test: DataFrame,
                         idCol: String, textCol: String, n: Int): DataFrame = {
    val testSh = Dedup.withShingleSet(test, idCol, textCol, n, "__sh")
      .select(col(idCol), explode(col("__sh")).as("__s"))
      .select(col(idCol), xxhash64(col("__s")).as("__h"))
    val trainSh = Dedup.withShingleSet(train, idCol, textCol, n, "__sh")
      .select(explode(col("__sh")).as("__s"))
      .select(xxhash64(col("__s")).as("__h")).distinct()
      .withColumn("__hit", lit(1L))
    testSh.join(trainSh, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("rate",
        col("n_hit").cast("double") / col("n_shingles").cast("double"))
  }
}
