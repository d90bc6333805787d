package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Scale design: every variant is shuffle-bounded by design —
  * exact dedup is one hash-groupBy; MinHash/SimHash candidate generation
  * shuffles only (bucket-key, id) pairs, never text; pairwise verification
  * runs only inside buckets/blocks, so the quadratic step is bounded by the
  * largest bucket, not the corpus. No driver-side collection anywhere.
  */
object Dedup {

  // ===== Exact =====

  /** Exact dedup: group by content fingerprint, keep the lowest id.
    * One hash aggregation; at 100 TB this is a single shuffle of
    * (16-byte fp, id) pairs. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"))

  /** Return the deduplicated rows themselves (keeper row per group). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keeper").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ===== Shingles =====

  /** Word n-gram shingles (distinct), e.g. n=3 → all consecutive
    * 3-token windows. Documents shorter than n tokens yield the whole
    * document as one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(text)
    val wins = transform(sequence(lit(1), size(t) - (n - 1)),
      i => array_join(slice(t, i, lit(n)), " "))
    array_distinct(when(size(t) >= n, wins).otherwise(array(array_join(t, " "))))
  }

  /** Jaccard similarity of the two columns' element sets (exact division of
    * integer set sizes — cross-engine deterministic). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  // ===== MinHash + LSH =====

  /** MinHash signature: k hash functions simulated by seeding xxhash64 with
    * the function index; signature element j = min over shingles of
    * hash_j(shingle). All inside codegen — no UDF. */
  def minhashSignature(text: Column, numHashes: Int, shingleLen: Int = 3): Column = {
    val sh = shingles(text, shingleLen)
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(sh, s => xxhash64(j, s))))
  }

  /** LSH banding: split the signature into `bands` rows of r = k/bands
    * hashes; bucket key = (band index, hash of the band slice). Documents
    * sharing any bucket become candidate pairs. */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 32, bands: Int = 8,
                     shingleLen: Int = 3): DataFrame = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    val sig = minhashSignature(col(textCol), numHashes, shingleLen)
    df.select(col(idCol), sig.as("sig"))
      .select(col(idCol), explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(b, slice(col("sig"), b * r + 1, lit(r)).cast("string")).as("bh")))).as("bucket"))
      .select(col(idCol), col("bucket.band"), col("bucket.bh"))
  }

  /** Candidate duplicate pairs (id1 < id2) from shared LSH buckets. The
    * self-join is per-bucket; bucket sizes bound the quadratic cost. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, bands: Int = 8,
                        shingleLen: Int = 3): DataFrame = {
    val b = minhashBuckets(df, idCol, textCol, numHashes, bands, shingleLen)
    val l = b.select(col("band"), col("bh"), col(idCol).as("id1"))
    val r = b.select(col("band"), col("bh"), col(idCol).as("id2"))
    l.join(r, Seq("band", "bh")).where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Full MinHash near-dup pipeline: LSH candidates verified by exact
    * shingle Jaccard ≥ threshold. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 32, bands: Int = 8,
                      shingleLen: Int = 3): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleLen)
    val docs = df.select(col(idCol), shingles(col(textCol), shingleLen).as("sh"))
    cand.join(docs.withColumnRenamed(idCol, "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(docs.withColumnRenamed(idCol, "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("jac", jaccard(col("sh1"), col("sh2")))
      .where(col("jac") >= threshold)
      .select("id1", "id2", "jac")
  }

  // ===== SimHash =====

  /** 64-bit SimHash over word tokens: bit k of the fingerprint is the sign
    * of the sum over tokens of ±1 depending on bit k of the token hash. */
  def simhash64(text: Column): Column = {
    val t = array_distinct(TextAnalysis.tokens(text))
    val bits = transform(sequence(lit(0), lit(63)), k =>
      when(aggregate(t, lit(0),
        (acc, tok) => acc + when(call_function("shiftright", xxhash64(tok), k).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        call_function("shiftleft", lit(1L), k)).otherwise(0L))
    aggregate(bits, lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits — any pair within
    * Hamming distance 3 shares at least one exact band (pigeonhole). */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSig = df.select(col(idCol), simhash64(col(textCol)).as("sig"))
    val banded = withSig.select(col(idCol), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"), call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFF).as("bh")))).as("bk"))
      .select(col(idCol), col("sig"), col("bk.band"), col("bk.bh"))
    val l = banded.select(col("band"), col("bh"), col(idCol).as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("bh"), col(idCol).as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "bh")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), bit_count(col("sig1").bitwiseXOR(col("sig2"))).as("hamming"))
      .distinct()
  }

  // ===== Blocked n-gram Jaccard =====

  /** Pairwise token n-gram Jaccard within blocks (e.g. same source+lang).
    * Blocking keys bound the quadratic join; pairs below threshold are
    * dropped early. */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], threshold: Double,
                          shingleLen: Int = 2): DataFrame = {
    val keyed = df.select((blockCols.map(col) :+ col(idCol) :+
      shingles(col(textCol), shingleLen).as("sh")): _*)
    val l = keyed.select((blockCols.map(col) :+ col(idCol).as("id1") :+ col("sh").as("sh1")): _*)
    val r = keyed.select((blockCols.map(col) :+ col(idCol).as("id2") :+ col("sh").as("sh2")): _*)
    l.join(r, blockCols).where(col("id1") < col("id2"))
      .withColumn("jac", jaccard(col("sh1"), col("sh2")))
      .where(col("jac") >= threshold)
      .select("id1", "id2", "jac")
  }

  // ===== Embedding near-dup =====

  /** Embedding-cosine near-duplicates via LSH bucketing + exact verify —
    * see Similarity.lshCandidates. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nPlanes: Int = 12, seed: Long = 42L): DataFrame =
    Similarity.lshCandidates(df, idCol, vecCol, nPlanes, seed)
      .where(col("cosine") >= threshold)
}
