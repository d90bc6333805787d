package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation scoring/batching operators: lexical diversity, n-gram
  * novelty, sequence-length bucketing. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalDiversity: hand-computed entropy and TTR; empty doc zeros") {
    val docs = Seq((1L, "a a b"), (2L, ""), (3L, "x x x x")).toDF("doc_id", "text")
    withPartitionings(docs) { d =>
      val out = Scoring.lexicalDiversity(d, "doc_id", "text")
        .orderBy("doc_id").collect()
      val r1 = out(0)
      assert(r1.getAs[Long]("n_tokens") === 3L)
      assert(r1.getAs[Long]("n_types") === 2L)
      assert(r1.getAs[Double]("ttr") === 0.666667)
      // -(2/3 ln 2/3 + 1/3 ln 1/3) = 0.6365141683... -> 9dp-rounded terms
      assert(math.abs(r1.getAs[Double]("entropy") - 0.636514) < 1e-6)
      val r2 = out(1)
      assert(r2.getAs[Long]("n_tokens") === 0L)
      assert(r2.getAs[Double]("entropy") === 0.0)
      assert(r2.getAs[Double]("ttr") === 0.0)
      // single repeated type: entropy exactly 0, ttr 1/4
      val r3 = out(2)
      assert(r3.getAs[Double]("entropy") === 0.0)
      assert(r3.getAs[Double]("ttr") === 0.25)
    }
  }

  test("ngramNovelty: reference docs score 0; disjoint docs score 1") {
    val docs = Seq(
      (10L, "the quick brown fox jumps"), // reference member
      (1L, "the quick brown fox jumps"),  // identical to reference -> 0
      (2L, "entirely different words here now"), // disjoint -> 1
      (3L, "a b")                          // < 3 tokens -> no grams
    ).toDF("doc_id", "text")
    val ref = docs.where(col("doc_id") % 10 === 0)
    withPartitionings(docs) { d =>
      val out = Scoring.ngramNovelty(d, ref, "doc_id", "text", n = 3)
        .orderBy("doc_id").collect()
      assert(out(0).getAs[Long]("n_ngrams") === 3L) // doc 1: 5 tokens -> 3 grams
      assert(out(0).getAs[Double]("novelty") === 0.0)
      assert(out(1).getAs[Double]("novelty") === 1.0)
      assert(out(2).getAs[Long]("n_ngrams") === 0L)
      assert(out(2).getAs[Double]("novelty") === 0.0)
      assert(out(3).getAs[Double]("novelty") === 0.0) // the ref doc itself
    }
  }

  test("lengthBuckets: bucket edges, truncation pad 0, batch fill order") {
    val mk = (i: Long, n: Int) => (i, Seq.fill(n)("w").mkString(" "))
    val docs = Seq(mk(1L, 5), mk(2L, 16), mk(3L, 17), mk(4L, 3000))
      .toDF("doc_id", "text")
    val out = Packing.lengthBuckets(docs, "doc_id", "text",
      batchTokenBudget = 8192, shards = 1, seed = 7L)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("bucket") === 16L)
    assert(out(0).getAs[Long]("pad") === 11L)
    assert(out(1).getAs[Long]("bucket") === 16L) // inclusive upper edge
    assert(out(2).getAs[Long]("bucket") === 32L)
    assert(out(3).getAs[Long]("bucket") === 2048L) // truncated to top bucket
    assert(out(3).getAs[Long]("pad") === 0L)
  }

  test("lengthBuckets: batches hold budget/bucket sequences, then roll over") {
    // 5 docs, all bucket 2048 (n=1500), budget 8192 -> capacity 4: one
    // full batch of 4, one partial of 1
    val docs = (1L to 5L).map(i => (i, Seq.fill(1500)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.lengthBuckets(docs, "doc_id", "text",
      batchTokenBudget = 8192, shards = 1, seed = 7L).collect()
    val sizes = out.groupBy(_.getAs[Long]("batch_id")).map(_._2.length).toSeq.sorted
    assert(sizes === Seq(1, 4))
  }

  test("lengthBuckets: batches never cross shards; assignment is seed-stable") {
    val docs = (1L to 40L).map(i => (i, "one two three")).toDF("doc_id", "text")
    val a = Packing.lengthBuckets(docs, "doc_id", "text", shards = 4, seed = 7L)
      .select("doc_id", "shard", "batch_id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val b = Packing.lengthBuckets(docs.repartition(7), "doc_id", "text",
      shards = 4, seed = 7L)
      .select("doc_id", "shard", "batch_id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a === b) // partitioning-independent
    assert(a.values.map(_._1).toSet.size > 1) // really uses several shards
  }
}
