package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece trainer (likelihood-gain merges, `##` continuation
  * convention) — hand-checked merges on a tiny corpus, plus the
  * fertility contract against BPE at equal budget. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("init tokens: first char plain, rest ##-prefixed") {
    val df = Seq("hello", "a").toDF("w")
      .select(WordPiece.initTokens(col("w")).as("t"))
    assert(df.collect().map(_.getSeq[String](0).toList).toList ==
      List(List("h", "##e", "##l", "##l", "##o"), List("a")))
  }

  test("mergePair: greedy left-to-right, ## stripped from the right side") {
    val df = Seq(Seq("a", "##b", "##b", "##b")).toDF("t")
      .select(WordPiece.mergePair(col("t"), "##b", "##b").as("m"))
    // greedy non-overlap: [a, ##b, ##b, ##b] -> [a, ##bb, ##b]
    assert(df.head().getSeq[String](0).toList == List("a", "##bb", "##b"))
    val df2 = Seq(Seq("a", "##b")).toDF("t")
      .select(WordPiece.mergePair(col("t"), "a", "##b").as("m"))
    assert(df2.head().getSeq[String](0).toList == List("ab"))
  }

  test("trainMerges: likelihood gain beats raw count (hand-checked corpus)") {
    // corpus: "xy" x4, "zq" x1, "xx" x4  (one word per doc)
    val docs = (Seq.fill(4)("xy") ++ Seq("zq") ++ Seq.fill(4)("xx")).toDF("text")
    // pair counts: (x,##y)=4, (z,##q)=1, (x,##x)=4
    // unit counts: x=8, ##y=4, z=1, ##q=1, ##x=4
    // scores: (x,##y)=4/32=0.125, (z,##q)=1/1=1.0, (x,##x)=4/32=0.125
    // BPE (raw count) would pick (x,##y) or (x,##x); WordPiece picks the
    // rare-but-reliable (z,##q).
    val ms = WordPiece.trainMerges(docs, "text", 1)
    val (a, b, c, ca, cb, score) = ms.head
    assert((a, b, c, ca, cb) == ("z", "##q", 1L, 1L, 1L))
    assert(score == 1.0)
  }

  test("trainMerges: tie on score breaks lexicographically; merged names chain") {
    val docs = Seq.fill(3)("ab").toDF("text")
    // round 1: only pair (a,##b) -> merged "ab"; round 2: no pairs left
    val ms = WordPiece.trainMerges(docs, "text", 1)
    assert(ms.map(m => (m._1, m._2)) == Seq(("a", "##b")))
    assertThrows[IllegalArgumentException](
      WordPiece.trainMerges(docs, "text", 2))
  }

  test("fertility: merges reduce pieces/word; bpe comparison on same corpus") {
    val docs = Seq.fill(5)("hello world").toDF("text")
    val ms = WordPiece.trainMerges(docs, "text", 4).map(m => (m._1, m._2))
    val (w0, p0) = WordPiece.fertility(docs, "text", Nil)
    val (w1, p1) = WordPiece.fertility(docs, "text", ms)
    assert(w0 == 10L && w1 == 10L)     // 5 docs x 2 words
    assert(p0 == 50L)                  // 10 chars per doc, 1 piece per char
    assert(p1 == p0 - 4 * 10L / 2)     // each merge removes 1 piece per word occurrence
    val bp = WordPiece.bpeMergesOnCleanCorpus(docs, "text", 4).map(m => (m._1, m._2))
    val (w2, p2) = WordPiece.bpeFertility(docs, "text", bp)
    assert(w2 == 10L && p2 == p1)      // same corpus, same budget, same gain here
  }
}
