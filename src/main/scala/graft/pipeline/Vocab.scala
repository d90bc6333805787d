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

  /** Skip-gram (center, context) pair counts with a symmetric window —
    * the training-pair extraction of word2vec-style embedding prep.
    * For token position i, every j with 0 < |i−j| ≤ window in the same
    * document contributes one (token_i, token_j) observation; counts
    * aggregate corpus-wide.
    *
    * Pairs stream out of the native [[graft.functions.SkipgramGenerate]]
    * generator — no positional self-join (t² join intermediates) and no
    * HOF struct-array churn (see the generator's scaladoc; the HOF form
    * below is retained as the property-spec reference). The only
    * shuffle is the final (center, context) count aggregate, with
    * map-side partials. */
  def skipgramPairs(docs: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, "skipgramPairs: window must be >= 1")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val gen = ColumnBridge.toColumn(graft.functions.SkipgramGenerate(
      ColumnBridge.toExpr(Scoring.tokenize(col(textCol))), window))
    docs.select(gen.as(Seq("center", "context")))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }

  /** Composable-HOF reference implementation of [[skipgramPairs]] —
    * identical pair multiset (spec-asserted); kept as the executable
    * specification the native generator is verified against. */
  private[pipeline] def skipgramPairsHof(docs: DataFrame, textCol: String,
                                         window: Int): DataFrame = {
    require(window >= 1, "skipgramPairs: window must be >= 1")
    val offsets = array(((-window to window).filter(_ != 0))
      .map(o => lit(o)): _*)
    val ws = col("__ws")
    val n = size(ws)
    val pairs = flatten(transform(sequence(lit(1), n), i =>
      filter(transform(offsets, o =>
        when(i + o >= 1 && i + o <= n,
          struct(element_at(ws, i).as("center"),
            element_at(ws, i + o).as("context")))),
        p => p.isNotNull)))
    docs.select(Scoring.tokenize(col(textCol)).as("__ws"))
      .where(size(ws) > 1)
      .select(explode(pairs).as("__p"))
      .groupBy(col("__p.center").as("center"), col("__p.context").as("context"))
      .agg(count(lit(1)).as("n"))
  }
}
