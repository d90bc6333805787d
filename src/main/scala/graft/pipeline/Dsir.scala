package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * NeurIPS): score every pool document by how much more likely its hashed
  * n-gram features are under a TARGET domain's distribution than under
  * the pool's own, then keep the most target-like fraction — the standard
  * recipe for tilting a web-scale corpus toward a quality domain without
  * training a classifier.
  *
  * Engine-portable by construction, so a SQL oracle replays it end to
  * end: token key = the (length, first-char, last-char) integer triple
  * (the hashedLinearScore convention — `length`/`ascii` replay it in any
  * engine; production swaps in xxhash64, same plumbing), bigram bucket =
  * multiplicative scatter of the two keys mod `buckets`, distribution
  * estimates = Laplace-smoothed exact integer counts, and each feature's
  * log-ratio contribution is ln-rounded to 9 dp and DECIMAL-summed
  * (order-independent ⇒ bit-stable under any partitioning — the
  * q_text_perplexity convention). Selection is a global rank on
  * (score desc, id) through the distributed prefix-fold primitive, never
  * a single-reducer window.
  *
  * 100 TB shape: one (doc, bucket) explode + groupBy per corpus for the
  * count tables (≤ `buckets` rows each — broadcast), one broadcast join
  * + decimal-sum aggregation for the scores, one range-exchange prefix
  * fold for the rank. Shuffles move (id, bucket) ints and (id, score)
  * rows, never text. */
object Dsir {

  /** Portable per-token integer key (replay: length/ascii only). */
  def tokenKey(t: Column): Column =
    length(t).cast("long") * 31L +
      ascii(substring(t, 1, 1)).cast("long") * 7L +
      ascii(substring(t, -1, 1)).cast("long")

  /** Bigram feature bucket: multiplicative scatter of the pair of token
    * keys, mod `buckets` — pure integer arithmetic, SQL-replayable. */
  def bigramBucket(k1: Column, k2: Column, buckets: Int): Column =
    pmod(pmod(pmod(k1 * 1000003L + k2, lit(2147483648L)) * 2654435761L,
      lit(2147483648L)), lit(buckets.toLong))

  /** One row per bigram occurrence: (id, bucket). Documents with fewer
    * than 2 tokens contribute no features (they score 0 downstream). */
  def bigramFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    docs.select(col(idCol), toks.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => bigramBucket(
          tokenKey(element_at(col("__t"), i)),
          tokenKey(element_at(col("__t"), i + 1)), buckets))).as("bucket"))
  }

  /** Per-bucket occurrence counts over a corpus (≤ `buckets` rows). */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int): DataFrame =
    bigramFeatures(docs, idCol, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-pool-document importance score:
    * Σ_features round(ln(p̂_target(b) / p̂_pool(b)), 9) as DECIMAL —
    * p̂(b) = (count(b) + 1) / (total + buckets), Laplace-smoothed.
    * Every pool document appears in the output (feature-less docs score
    * 0 with n_feats 0). Output: (id, n_feats, score: DECIMAL(28,9)). */
  def importanceScores(pool: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, buckets: Int): DataFrame = {
    import graft.pipeline.Checkpoints.DatasetCheckpointOps
    val tCounts = bucketCounts(target, idCol, textCol, buckets)
    // the pool's feature table feeds BOTH the count aggregation and the
    // per-doc scoring join — one checkpoint, one corpus tokenization pass
    val feats = bigramFeatures(pool, idCol, textCol, buckets)
      .stageCheckpoint(false)
    val pCounts = feats.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val tTot = tCounts.agg(coalesce(sum("cnt"), lit(0L)).as("t_tot"))
    val pTot = pCounts.agg(coalesce(sum("cnt"), lit(0L)).as("p_tot"))
    // full bucket domain so a feature unseen in either corpus still gets
    // its smoothed ratio (ln of the totals ratio)
    val domain = pool.sparkSession.range(buckets).select(col("id").as("bucket"))
    val ratio = domain
      .join(tCounts.withColumnRenamed("cnt", "t_cnt"), Seq("bucket"), "left")
      .join(pCounts.withColumnRenamed("cnt", "p_cnt"), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(pTot))
      .select(col("bucket"),
        round(log(
          ((coalesce(col("t_cnt"), lit(0L)) + 1L).cast("double") /
            (col("t_tot") + buckets).cast("double")) /
          ((coalesce(col("p_cnt"), lit(0L)) + 1L).cast("double") /
            (col("p_tot") + buckets).cast("double"))), 9)
          .cast("decimal(20,9)").as("lr"))
    val scored = feats.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("lr")).cast("decimal(28,9)").as("score"))
    pool.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0L).cast("decimal(28,9)")).as("score"))
  }

  /** Keep the most target-like fraction: global 0-based rank on
    * (score desc, id asc) via the distributed prefix fold, kept iff
    * rank · den < n · num (i.e. the top num/den fraction, exact integer
    * comparison — no float threshold). Output adds (rank, keep). */
  def selectTopFraction(scored: DataFrame, idCol: String,
                        num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"selectTopFraction: need 0 < num/den <= 1, got $num/$den")
    val n = scored.count()
    Profile.rowPositions(scored, "rank", col("score").desc, col(idCol))
      .withColumn("keep", col("rank") * den < lit(n) * num)
  }
}
