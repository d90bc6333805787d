package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Web-corpus ingest operators: markup stripping, URL canonicalization,
  * corpus-level line dedup. */
class WebCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def strip1(s: String): String =
    Seq(s).toDF("h").select(TextAnalysis.stripMarkup(col("h"))).as[String].head()

  test("stripMarkup removes script/style with content, tags as word breaks") {
    assert(strip1("<p>a</p><script>var x=1;</script><b>b</b>") === "a b")
    assert(strip1("a<style media='x'>p{}</style>b") === "a b")
    assert(strip1("one<br>two") === "one two")
    assert(strip1("<!-- hidden -->shown") === "shown")
    // script content may span lines and close in any case
    assert(strip1("x<script a=1>line1\nline2</SCRIPT>y") === "x y")
  }

  test("stripMarkup decodes entities, &amp; last (double-escape preserved)") {
    assert(strip1("a &amp; b") === "a & b")
    assert(strip1("&lt;tag&gt;") === "<tag>")
    // &amp;lt; is an ESCAPED '&lt;' — must decode to the text '&lt;', not '<'
    assert(strip1("&amp;lt;") === "&lt;")
    assert(strip1("a&nbsp;b &quot;c&quot; &#39;d&#39;") === "a b \"c\" 'd'")
  }

  test("stripMarkup: unclosed script degrades to tag-strip, not swallow") {
    assert(strip1("a<script>b") === "a b")
  }

  test("markupRatio and htmlTitle") {
    val df = Seq("<html><title>T1</title><p>body text</p></html>").toDF("h")
    val r = df.select(TextAnalysis.markupRatio(col("h")).as("r"),
      TextAnalysis.htmlTitle(col("h")).as("t")).head()
    assert(r.getString(1) === "T1")
    assert(r.getDouble(0) > 0.5 && r.getDouble(0) < 1.0)
    // markup-free text scores 0
    val z = Seq("plain words").toDF("h")
      .select(TextAnalysis.markupRatio(col("h"))).as[Double].head()
    assert(z === 0.0)
  }

  private def canon1(s: String): String =
    Seq(s).toDF("u").select(TextAnalysis.canonicalizeUrl(col("u"))).as[String].head()

  test("canonicalizeUrl: case, default ports, fragment, tracking, order, slash") {
    assert(canon1("HTTPS://WWW.Ex.COM:443/a/b/?b=2&utm_source=x&a=1#frag")
      === "https://www.ex.com/a/b?a=1&b=2")
    assert(canon1("http://ex.com:80/") === "http://ex.com/")
    // :80 is NOT default for https — kept
    assert(canon1("https://ex.com:80/p") === "https://ex.com:80/p")
    assert(canon1("https://ex.com") === "https://ex.com/")
    // all params tracking -> no query at all
    assert(canon1("https://ex.com/p?utm_a=1&gclid=2") === "https://ex.com/p")
    assert(canon1("https://ex.com/p?ref=home&v=1") === "https://ex.com/p?v=1")
    // root path keeps its slash
    assert(canon1("https://ex.com/?v=1") === "https://ex.com/?v=1")
  }

  test("canonicalizeUrl: non-URL strings pass through unchanged") {
    assert(canon1("not a url") === "not a url")
  }

  test("dedupCorpusLines drops heavy lines, keeps order, keeps empty docs") {
    val boiler = "FOOTER"
    val docs = (1 to 9).map(i => (i.toLong, s"unique $i\n$boiler"))
      .toDF("doc_id", "t")
      // doc 10 is boilerplate-only: must survive with clean_text = ''
      .union(Seq((10L, boiler)).toDF("doc_id", "t"))
    withPartitionings(docs) { d =>
      val out = TextAnalysis.dedupCorpusLines(d, "doc_id", "t", maxOccurrences = 5L)
        .orderBy("doc_id").collect()
      assert(out.length === 10)
      val d1 = out.head
      assert(d1.getAs[Long]("n_lines") === 2L)
      assert(d1.getAs[Long]("n_removed") === 1L)
      assert(d1.getAs[String]("clean_text") === "unique 1")
      val d10 = out.last
      assert(d10.getAs[Long]("n_lines") === 1L)
      assert(d10.getAs[Long]("n_removed") === 1L)
      assert(d10.getAs[String]("clean_text") === "")
    }
  }

  test("dedupCorpusLines: multi-line survivors keep original line order") {
    val docs = Seq((1L, "z\na\nCOMMON"), (2L, "COMMON"), (3L, "COMMON"),
      (4L, "COMMON")).toDF("doc_id", "t")
    val out = TextAnalysis.dedupCorpusLines(docs, "doc_id", "t", maxOccurrences = 3L)
      .orderBy("doc_id").collect()
    assert(out.head.getAs[String]("clean_text") === "z\na")
  }
}
