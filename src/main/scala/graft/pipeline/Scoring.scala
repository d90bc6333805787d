package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level relevance scoring — TF-IDF and BM25 — for training-data
  * curation (dedup-adjacent quality signals, query-based filtering).
  * Beyond-reference surface: the reference has no corpus statistics.
  *
  * Shuffle shape at 100 TB: one explode+groupBy on (doc, term) — the
  * shuffle moves (id, term, count) triples, never document text — then a
  * term-keyed join for document frequencies and an id-keyed join for
  * document lengths. Corpus scalars (N, avgdl) ride a broadcast of a
  * 1-row aggregate, not a driver collect. Term skew (stopwords) is
  * bounded: the df aggregation is a partial/final count, and the join
  * back fans out by term — AQE's skew-join split handles hot terms.
  */
object Scoring {

  /** Lowercased alphanumeric tokenization (portable: same regex splits in
    * any RE2/Java engine; empty fragments from leading/consecutive
    * delimiters are dropped). */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** One row per distinct (doc, term): raw term frequency. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokenize(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-(doc, term) TF-IDF and BM25 scores over the whole corpus.
    * Returns (idCol, term, tf, df, dl, tfidf, bm25) — unrounded doubles;
    * round at the output edge for cross-engine comparison.
    *
    * tfidf = tf · (ln((N+1)/(df+1)) + 1)   (smoothed, sklearn-style)
    * bm25  = ln(1 + (N-df+0.5)/(df+0.5)) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))
    *
    * N and avgdl count docs with ≥ 1 token (empty docs contribute nothing
    * to the corpus statistics). avgdl is Σdl/N computed from an exact
    * integer sum — one double division, deterministic across engines.
    */
  def tfidfBm25(docs: DataFrame, idCol: String, textCol: String,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = col("n").cast("double")
    val idfTfidf = log((n + 1) / (col("df") + 1)) + 1
    val idfBm25 = log(lit(1) + (n - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1) - b + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfreq, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        (col("tf") * idfTfidf).as("tfidf"),
        (idfBm25 * tfNorm).as("bm25"))
  }

  /** Gopher-style repetition report per document:
    * (idCol, n_tokens, top_token_frac, dup_bigram_frac) where
    * top_token_frac = share of tokens held by the single most frequent
    * token and dup_bigram_frac = share of word bigrams occurring more
    * than once — the standard degenerate/boilerplate-document signals.
    *
    * Shape: linear window-build per document (a transform over the token
    * array — same class as the shingle pipelines), then two (id, gram)
    * count aggregations; every shuffle is keyed by (id, token), so hot
    * documents spread across reducers. Documents with zero tokens are
    * absent; < 2 tokens ⇒ dup_bigram_frac 0. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = TextAnalysis.tokens(col(textCol))
    val base = docs.select(col(idCol), t.as("__t"))
    val tokCounts = base.select(col(idCol), explode(col("__t")).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
    val tokStats = tokCounts.groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_tokens"), max(col("__n")).as("__top"))
    val grams = base.select(col(idCol), explode(
      when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => concat_ws(" ", element_at(col("__t"), i), element_at(col("__t"), i + 1))))
        .otherwise(array())).as("__g"))
    val gramStats = grams.groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("__ng"),
        sum(when(col("__n") > 1, col("__n")).otherwise(0L)).as("__dup"))
    tokStats.join(gramStats, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(col("__top").cast("double") / col("n_tokens").cast("double"), 6)
          .as("top_token_frac"),
        coalesce(round(col("__dup").cast("double") / col("__ng").cast("double"), 6),
          lit(0.0)).as("dup_bigram_frac"))
  }

  /** Top-k terms per document by a score column, deterministic: ranking
    * uses the score ROUNDED to `roundScale` decimals (so a last-ulp
    * cross-engine double difference cannot flip ranks) with the term as
    * tiebreak. The rank window partitions by document id — high
    * cardinality, scales. */
  def topTerms(scored: DataFrame, idCol: String, scoreCol: String, k: Int,
               roundScale: Int = 6): DataFrame = {
    val r = round(col(scoreCol), roundScale)
    val w = Window.partitionBy(col(idCol)).orderBy(r.desc, col("term").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .withColumn("rank", col("__rk").cast("int"))
      .drop("__rk")
  }
}
