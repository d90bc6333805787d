package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Log-template mining, gazetteer tagging, skip-gram pair extraction,
  * and Hamilton apportionment semantics.
  */
class SessionTextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("logTemplates: digit masking groups and min-id exemplar; NULL dropped") {
    val df = Seq((5L, Some("get /user/42 took 10ms")),
      (3L, Some("get /user/7 took 200ms")),
      (9L, Some("post /cart")), (1L, None)).toDF("id", "line")
    val out = rows(TextAnalysis.logTemplates(df, "id", "line")
      .orderBy("template"))
    assert(out == Seq(
      Seq("get /user/# took #ms", 2L, 3L),
      Seq("post /cart", 1L, 9L)))
  }

  test("tagEntities: case-normalized dictionary, counts and first position") {
    val docs = Seq((1L, "Spark beats spark, spark! and hadoop"),
      (2L, "nothing relevant here")).toDF("doc_id", "text")
    val gaz = Seq("SPARK", "hadoop").toDF("name")
    val out = rows(TextAnalysis.tagEntities(docs, "doc_id", "text", gaz, "name")
      .orderBy("doc_id", "entity"))
    assert(out == Seq(Seq(1L, "hadoop", 1L, 6), Seq(1L, "spark", 3L, 1)))
  }

  test("skipgramPairs: window-1 pairs on a 3-token doc") {
    val docs = Seq(Tuple1("a b c")).toDF("text")
    val out = rows(Vocab.skipgramPairs(docs, "text", window = 1)
      .orderBy("center", "context"))
    assert(out == Seq(Seq("a", "b", 1L), Seq("b", "a", 1L),
      Seq("b", "c", 1L), Seq("c", "b", 1L)))
  }

  test("skipgramPairs: equals brute force at window 2 across docs") {
    val texts = Seq("a b c d e a b", "x y x y x", "solo", "")
    val docs = texts.map(Tuple1(_)).toDF("text")
    withPartitionings(docs) { d =>
      val out = rows(Vocab.skipgramPairs(d, "text", window = 2))
        .map(r => (r(0), r(1)) -> r(2)).toMap
      val brute = texts.map(_.split(" ").filter(_.nonEmpty))
        .filter(_.length > 1)
        .flatMap { ws =>
          for { i <- ws.indices; o <- Seq(-2, -1, 1, 2)
                if i + o >= 0 && i + o < ws.length }
            yield (ws(i), ws(i + o))
        }.groupBy(identity).map { case (k, v) => (k: (Any, Any)) -> v.size.toLong }
      assert(out == brute)
    }
  }

  test("skipgramPairs: native generator equals the HOF reference") {
    val texts = Seq("a b c d e a b", "x y x y x", "one two", "solo", "",
      "p q r s t u v w x y z")
    val docs = texts.map(Tuple1(_)).toDF("text")
    for (w <- 1 to 3) {
      val gen = rows(Vocab.skipgramPairs(docs, "text", w)
        .orderBy("center", "context"))
      val hof = rows(Vocab.skipgramPairsHof(docs, "text", w)
        .orderBy("center", "context"))
      assert(gen == hof, s"window $w")
    }
  }

  test("naiveBayes: classifies by word evidence; unseen words and ties") {
    val train = Seq((1L, "spark spark rdd", "big"), (2L, "spark shuffle", "big"),
      (3L, "cat dog", "pet"), (4L, "dog dog bird", "pet"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((10L, "spark rdd shuffle"), (11L, "dog cat cat"),
      (12L, "zzz unseen words")).toDF("doc_id", "text")
    val out = rows(Scoring.naiveBayes(train, test, "doc_id", "text", "lang")
      .orderBy("doc_id"))
    assert(out.map(r => (r.head, r(1))) ==
      Seq((10L, "big"), (11L, "pet"), (12L, "big")))
    // doc 12: all words unseen — both labels get only unseen mass;
    // T_big = 5, T_pet = 5, V = 7 → identical scores, tie → 'big'
    assert(out(2)(1) == "big")
  }

  test("sortedNeighborhoodPairs: every record pairs with its w successors") {
    val df = Seq((1L, "anna"), (2L, "annb"), (3L, "bob"), (4L, "bobb"),
      (5L, "zed")).toDF("id", "k")
    withPartitionings(df) { d =>
      val out = rows(Dedup.sortedNeighborhoodPairs(d, "id", "k", w = 2)
        .orderBy("id_a", "id_b"))
      // sort order: anna(1) annb(2) bob(3) bobb(4) zed(5); pairs at
      // rank distance <= 2
      assert(out.map(r => (r.head, r(1), r.last)) == Seq(
        (1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L), (2L, 4L, 2L),
        (3L, 4L, 1L), (3L, 5L, 2L), (4L, 5L, 1L)))
    }
  }

  test("apportion: seats sum to total, remainders ranked, tie by key") {
    // w = (3, 3, 4) over T=5: bases (1,1,2), remainders (5,5,0) — the one
    // leftover seat goes to the smaller key of the tied remainders
    val df = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("k", "w")
    val out = rows(Sampling.apportion(df, "k", "w", total = 5L).orderBy("k"))
    assert(out == Seq(Seq("a", 3L, 2L), Seq("b", 3L, 1L), Seq("c", 4L, 2L)))
  }

  test("apportion: exactness property on uneven weights; zero weight gets zero") {
    val df = Seq(("a", 1L), ("b", 0L), ("c", 999L), ("d", 17L), ("e", 2L))
      .toDF("k", "w")
    withPartitionings(df) { d =>
      val out = rows(Sampling.apportion(d, "k", "w", total = 97L))
      assert(out.map(_.last.asInstanceOf[Long]).sum == 97L)
      assert(out.find(_.head == "b").get.last == 0L)
      // proportionality within 1 seat of the exact quota
      out.foreach { r =>
        val q = r(1).asInstanceOf[Long] * 97.0 / 1019.0
        val s = r.last.asInstanceOf[Long].toDouble
        assert(s >= math.floor(q) && s <= math.ceil(q))
      }
    }
  }

  test("apportion: all-zero weights allocate nothing") {
    val df = Seq(("a", 0L), ("b", 0L)).toDF("k", "w")
    val out = rows(Sampling.apportion(df, "k", "w", total = 10L))
    assert(out.map(_.last) == Seq(0L, 0L))
  }
}
