package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE semantics pinned by hand: Sennrich-style per-position pair counts
  * over word frequencies, deterministic tie-break (count desc, then
  * lexicographic pair), greedy left-to-right merge application, merges
  * never crossing word boundaries.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges: hand-checked merge order on a tiny corpus") {
    // words: "aa" x3, "ab" x1, "abc" x1, "a" x1
    // round 0 pairs: (a,a)=3  (a,b)=2  (b,c)=1  -> merge (a,a)
    // round 1: "aa"->[aa], "ab"->[a,b], "abc"->[a,b,c], "a"->[a]
    //          pairs: (a,b)=2 (b,c)=1 -> merge (a,b)
    // round 2: "abc"->[ab,c] -> pairs: (ab,c)=1 -> merge (ab,c)
    val docs = Seq((1L, "aa ab aa"), (2L, "abc aa a")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 3)
    assert(ms == Seq(("a", "a", 3L), ("a", "b", 2L), ("ab", "c", 1L)))
  }

  test("trainMerges: tie on count breaks to the lexicographically smallest pair") {
    // (a,b)=1 and (b,a)=1 from "ab ba": pick (a,b)
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 1)
    assert(ms.head == ("a", "b", 1L))
  }

  test("mergePair: greedy left-to-right on runs — 'aaa' -> [aa, a], 'aaaa' -> [aa, aa]") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a")).toDF("toks")
    val out = df.select(Bpe.mergePair(col("toks"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "a"), List("aa", "aa")))
  }

  test("trainMerges fails loudly when the corpus runs out of pairs") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // single-char words only
    intercept[IllegalArgumentException] {
      Bpe.trainMerges(docs, "text", 2)
    }
  }

  test("encode: applies merges in rank order per word, empty docs survive") {
    val docs = Seq((1L, "aa ab aa"), (2L, "abc aa a"), (3L, "   "))
      .toDF("doc_id", "text")
    val ms = Seq(("a", "a"), ("a", "b"), ("ab", "c"))
    withPartitionings(docs) { d =>
      val out = Bpe.encode(d, "doc_id", "text", ms).orderBy("doc_id")
      val got = out.collect().map(r => (r.getLong(0), r.getInt(1))).toList
      // doc1: [aa][ab][aa] -> 3 tokens; doc2: [abc][aa][a] -> 3; doc3: empty
      assert(got == List((1L, 3), (2L, 3), (3L, 0)))
      // fingerprints differ between docs with different token streams
      assert(out.select("fp").distinct().count() == 3)
    }
  }

  test("encode matches trainMerges' working state (round-trip consistency)") {
    val docs = Seq((1L, "the cat the cat sat"), (2L, "the hat")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 4).map(m => (m._1, m._2))
    val out = Bpe.encode(docs, "doc_id", "text", ms).orderBy("doc_id").collect()
    // after 4 merges ("th","e" or similar), token counts strictly shrink
    // from the raw char counts (13+2 spaces? raw chars: doc1 15 letters)
    assert(out.map(_.getInt(1)).sum < 22) // raw letter count is 22
  }

  test("trainMergesBatched equals trainMerges merge-for-merge on natural " +
    "and adversarial corpora") {
    val corpora = Seq(
      // natural-ish
      Seq((1L, "the cat the cat sat on the mat"), (2L, "the hat that cat")),
      // the tie counterexample that forces the ceiling rule: merging
      // (a,b) creates (ab, y) with the SAME count as the disjoint
      // candidate (ac, z), and "ab" sorts before "ac" — a naive
      // disjoint-prefix batch would diverge from serial here
      Seq((1L, Seq.fill(3)("xaby").mkString(" ")),
        (2L, Seq.fill(3)("qacz").mkString(" "))),
      // the self-pair counterexample: (a,a) merges create (aa,aa) whose
      // progenitor is the merged pair itself — rule 3 territory
      Seq((1L, Seq.fill(5)("aaaa").mkString(" ")),
        (2L, Seq.fill(2)("bc").mkString(" "))),
      // heavy token sharing: most top pairs chain on 'a'
      Seq((1L, "ab ab ac ac ad ad ae ae"), (2L, "ba ca da ea")))
    for ((rows, ci) <- corpora.zipWithIndex; m <- Seq(2, 3, 6)) {
      val docs = rows.toDF("doc_id", "text")
      val serialT = scala.util.Try(Bpe.trainMerges(docs, "text", m))
      if (serialT.isFailure) {
        // corpus exhausts before m merges: batched must fail the same way
        assert(scala.util.Try(
          Bpe.trainMergesBatched(docs, "text", m)).isFailure,
          s"corpus $ci, merges $m: serial failed but batched succeeded")
      } else {
      val serial = serialT.get
      for (mb <- Seq(1, 2, 32)) {
        val batched = Bpe.trainMergesBatched(docs, "text", m, maxBatch = mb)
        assert(batched == serial,
          s"corpus $ci, merges $m, maxBatch $mb:\n  batched=$batched\n  serial =$serial")
      }
      }
    }
  }

  test("trainMergesBatched amortizes rounds when top pairs are disjoint") {
    // 8 disjoint high-frequency pairs with strictly descending counts:
    // ecah round should take several merges, not one
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(20 - i)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val serial = Bpe.trainMerges(docs, "text", 8)
    val batched = Bpe.trainMergesBatched(docs, "text", 8, maxBatch = 8)
    assert(batched == serial)
    assert(Bpe.lastBatchedRounds < 8,
      s"expected amortization, got ${Bpe.lastBatchedRounds} rounds for 8 merges")
  }
}
