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

  /** (unit, count) table over unigram tokens or n-token shingles — the
    * shared input of the richness estimators below. A small closed
    * vocabulary has no rare UNIGRAMS (every word is frequent), so
    * richness questions are asked of shingles there. */
  private def shingleCounts(docs: DataFrame, textCol: String,
                            width: Int): DataFrame = {
    require(width >= 1, "shingleCounts: width must be >= 1")
    val units =
      if (width == 1)
        docs.select(explode(Scoring.tokenize(col(textCol))).as("__w"))
      else
        docs.select(Scoring.tokenize(col(textCol)).as("__t"))
          .where(size(col("__t")) >= width)
          .select(explode(expr(
            s"transform(sequence(1, size(__t) - ${width - 1}), " +
              s"i -> array_join(slice(__t, i, $width), ' '))")).as("__w"))
    units.groupBy("__w").agg(count(lit(1)).as("__c"))
  }

  /** Chao1 species-richness estimate + Good's coverage over the corpus
    * vocabulary — the "how much vocabulary haven't we seen yet"
    * estimator a dedup/curation pipeline uses to decide whether more
    * crawling still buys new content: from the frequency-of-frequencies
    * table, Chao1 = D + f₁(f₁−1)/(2(f₂+1)) (the bias-corrected form —
    * defined even when no doubletons exist) and coverage C = 1 − f₁/N.
    * Two tiny aggregations over the word-count table; ratios are fixed
    * dags over exact counts, rounded 6 dp.
    * Output: 1 row (n_tokens, n_distinct, f1, f2, chao1, coverage). */
  def chao1Richness(docs: DataFrame, textCol: String,
                    shingleWidth: Int = 1): DataFrame = {
    val counts = shingleCounts(docs, textCol, shingleWidth)
    counts.agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("n_distinct"), col("f1"), col("f2"),
        round(col("n_distinct").cast("double") +
          col("f1").cast("double") * (col("f1").cast("double") - lit(1.0)) /
            (lit(2.0) * (col("f2").cast("double") + lit(1.0))), 6)
          .as("chao1"),
        round(lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double"), 6).as("coverage"))
  }

  /** Good-Turing adjusted counts r* = (r+1)·S(r+1)/S(r) for the low
    * frequencies (r ≤ maxR) — the smoothing table an n-gram LM builds
    * from the same frequency-of-frequencies: how much probability mass
    * the singletons/doubletons should REALLY carry. Rows where S(r+1)
    * is zero report NULL r* (the raw estimator is undefined there —
    * smoothing the S curve is the caller's modeling choice).
    * Output: (r, n_r, r_star) for r = 1..maxR. */
  def goodTuring(docs: DataFrame, textCol: String, maxR: Int = 5,
                 shingleWidth: Int = 1): DataFrame = {
    require(maxR >= 1, "goodTuring: maxR must be >= 1")
    val counts = shingleCounts(docs, textCol, shingleWidth)
    val fof = counts.groupBy(col("__c").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .where(col("r") <= maxR + 1)
    // global window over the frequency-of-frequency table — at most
    // maxR + 1 rows (sweep-audited r8)
    val w = Window.orderBy(col("r").asc)
    fof
      .withColumn("__nextR", lead(col("r"), 1).over(w))
      .withColumn("__nextN", lead(col("n_r"), 1).over(w))
      .where(col("r") <= maxR)
      .select(col("r"), col("n_r"),
        when(col("__nextR") === col("r") + 1,
          round((col("r").cast("double") + lit(1.0)) *
            col("__nextN").cast("double") / col("n_r").cast("double"), 6))
          .as("r_star"))
  }
}
