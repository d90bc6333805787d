package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the co-occurrence analytics a
  * recommendation or curriculum pipeline runs over (basket, item) facts
  * (orders×parts, user×domains visited, doc×topics). Beyond-reference
  * surface; the relational shape is the classic two-aggregate + bounded
  * self-join Apriori step for pairs.
  *
  * Scale posture: the self-join is WITHIN a basket key, so candidate
  * volume is Σ_b |b|² — bounded by the basket-size distribution, never
  * n². Shuffles: one distinct on (basket, item), one basket-key
  * self-join, one (i1, i2) pair aggregation; item counts and the basket
  * total ride broadcast joins of post-aggregation tables. A corpus with
  * pathological mega-baskets should cap them upstream (the same
  * guard Dedup's LSH buckets use); support pruning happens at the pair
  * AGGREGATE (after the per-basket expansion, which the basket-size
  * bound already limits).
  */
object Association {

  /** Frequent item-pair rules: for every unordered item pair co-occurring
    * in ≥ minSupportCount baskets — (i1 < i2, c12, c1, c2, n_baskets,
    * support, confidence = P(i2|i1), lift). Presence-based (multiplicity
    * within a basket doesn't count — the distinct is the first step).
    * All counts are exact integers; the three ratios are fixed double
    * dags over them, so any engine reproduces the doubles bit-for-bit. */
  def itemPairRules(df: DataFrame, basketCol: String, itemCol: String,
                    minSupportCount: Long): DataFrame = {
    require(minSupportCount >= 1, "itemPairRules: minSupportCount must be >= 1")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull).distinct()
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCnt = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = items.select(col("__b"), col("__i").as("i1"))
      .join(items.select(col("__b"), col("__i").as("i2")), Seq("__b"))
      .where(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minSupportCount)
    pairs
      .join(broadcast(itemCnt.select(col("__i").as("i1"), col("__c").as("c1"))), Seq("i1"))
      .join(broadcast(itemCnt.select(col("__i").as("i2"), col("__c").as("c2"))), Seq("i2"))
      .crossJoin(broadcast(nBaskets))
      .select(col("i1"), col("i2"), col("c12"), col("c1"), col("c2"),
        col("n_baskets"),
        (col("c12").cast("double") / col("n_baskets").cast("double")).as("support"),
        (col("c12").cast("double") / col("c1").cast("double")).as("confidence"),
        ((col("n_baskets").cast("double") * col("c12").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))).as("lift"))
  }

  /** Item-item co-occurrence cosine similarity with per-item top-k — the
    * "customers who bought X also bought Y" recommender table:
    * cos(i,j) = c_ij / √(c_i·c_j) over presence counts (c_i = baskets
    * containing i). Both directions of each undirected pair are ranked,
    * so every item gets its own top-k list; ties break on (c12 desc,
    * neighbor id asc), and the ORDER key is the raw double cosine —
    * one correctly-rounded sqrt + divide over exact integers, so every
    * engine computes the identical bits (rounding to 6 dp happens only
    * at the output edge).
    *
    * Scale: pair generation is the [[itemPairRules]] per-basket
    * self-join (bounded by Σ|basket|², shuffles keyed on basket then
    * pair); the rank window partitions by item over the PAIR-COUNT
    * table, never raw baskets. */
  def itemPairCosine(df: DataFrame, basketCol: String, itemCol: String,
                     minPairCount: Long, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 0, "itemPairCosine: topK must be positive")
    require(minPairCount >= 1, "itemPairCosine: minPairCount must be >= 1")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull).distinct()
    val itemCnt = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val und = items.select(col("__b"), col("__i").as("i1"))
      .join(items.select(col("__b"), col("__i").as("i2")), Seq("__b"))
      .where(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minPairCount)
    val dir = und.unionByName(
      und.select(col("i2").as("i1"), col("i1").as("i2"), col("c12")))
    val cos = col("c12").cast("double") /
      sqrt((col("c1") * col("c2")).cast("double"))
    val w = Window.partitionBy(col("i1"))
      .orderBy(cos.desc, col("c12").desc, col("i2").asc)
    dir
      .join(itemCnt.select(col("__i").as("i1"), col("__c").as("c1")), Seq("i1"))
      .join(itemCnt.select(col("__i").as("i2"), col("__c").as("c2")), Seq("i2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("i1"), col("i2"), col("c12"), col("c1"), col("c2"),
        round(cos, 6).as("cosine"), col("rank"))
  }
}
