package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary building + corpus token-id encoding — the tokenizer-prep
  * stage of a training-data pipeline (beyond-reference surface, same
  * family as TF-IDF/Scoring): count words across the corpus, freeze a
  * bounded top-V vocabulary with contiguous ids, and re-encode every
  * document as an id sequence.
  *
  * Scale design: the corpus-wide count is ONE partial-agg shuffle keyed
  * on the token (map-side combine collapses per-split duplicates before
  * the exchange); the top-V cut compiles to TakeOrderedAndProject
  * (bounded — never a global sort); the id assignment's single-partition
  * window runs over exactly V rows (vocabulary-sized, like IVF
  * centroids — bounded metadata, not data); and the encode pass is a
  * single scan with the vocabulary attached as a BROADCAST one-row map —
  * no shuffle touches the corpus. OOV tokens map to `unkId`.
  */
object Vocab {

  /** Corpus-wide (token, n) counts — the scalable aggregation. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Top-`size` vocabulary with contiguous ids 0..V-1, deterministic
    * order (count desc, then token asc — ties cannot reorder between
    * runs or engines). `minCount` drops the hapax tail first. */
  def build(docs: DataFrame, textCol: String, size: Int,
            minCount: Long = 1L): DataFrame = {
    require(size > 0, "Vocab.build: size must be positive")
    val byFreq = tokenCounts(docs, textCol)
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("token"))
      .limit(size) // TakeOrderedAndProject — bounded
    // single-partition window over exactly V rows (bounded metadata)
    byFreq.withColumn("id",
      (row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1)
        .cast("int"))
  }

  /** Encode each document's tokens as vocabulary ids (`unkId` for OOV).
    * The (token → id) map is folded into ONE row by a distributed
    * aggregation and attached via broadcast — the corpus pass itself is
    * shuffle-free. */
  def encode(docs: DataFrame, textCol: String, vocab: DataFrame,
             out: String, unkId: Int = -1): DataFrame = {
    val vmap = vocab.agg(
      map_from_entries(collect_list(struct(col("token"), col("id"))))
        .as("__vmap"))
    docs.crossJoin(broadcast(vmap))
      .withColumn(out, transform(TextAnalysis.tokens(col(textCol)),
        t => coalesce(element_at(col("__vmap"), t), lit(unkId))))
      .drop("__vmap")
  }
}
