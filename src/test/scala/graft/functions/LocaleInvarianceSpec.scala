package graft.functions

import java.util.Locale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.operators.Relational
import graft.pipeline.Index
import graft.types.GraftTypes

/** Executor and driver JVMs on a real cluster need not share the
  * submitter's default locale. Every driver-side case conversion must
  * therefore be `Locale.ROOT`-pinned: under a Turkish default locale,
  * `"INNER".toLowerCase` is "ınner" (dotless ı) and `"int64".toUpperCase`
  * is "İNT64", so a platform-locale conversion either rejects valid input
  * loudly (join-type / unit validation) or — worse — silently mismatches
  * Spark's own locale-independent `lower()` (stringContainsCI, index
  * search terms). This spec re-runs the sensitive entry points with the
  * JVM default flipped to tr-TR and demands identical behavior.
  */
class LocaleInvarianceSpec extends SparkSpec {

  private def underLocale[A](l: Locale)(body: => A): A = {
    val prev = Locale.getDefault
    Locale.setDefault(l)
    try body finally Locale.setDefault(prev)
  }

  private val turkish = new Locale("tr", "TR")

  test("stringContainsCI matches Spark's lower() under a Turkish default locale") {
    // Dotted capital I is the trap: "VISIBLE".toLowerCase(tr) == "vısıble",
    // which never matches lower(col) == "visible".
    underLocale(turkish) {
      import spark.implicits._
      val df = Seq("the king is visible tonight", "nothing here").toDF("t")
      val hits = df.where(graft.functions.Exprs.stringContainsCI(col("t"), "VISIBLE")).count()
      assert(hits === 1L)
    }
  }

  test("join-type and unit validation accept uppercase spellings under tr-TR") {
    underLocale(turkish) {
      import spark.implicits._
      val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
      val r = Seq((1, "x")).toDF("k", "rv")
      val j = Relational.hashJoin(l, r, l("k") === r("k"), joinType = "INNER")
      assert(j.count() === 1L)
    }
  }

  test("reference type names resolve case-insensitively under tr-TR") {
    underLocale(turkish) {
      assert(GraftTypes.toSpark("int64") === LongType)
    }
  }

  test("index search terms lowercase like the index's own tokens under tr-TR") {
    underLocale(turkish) {
      import spark.implicits._
      val docs = Seq((1L, "It is time"), (2L, "no match")).toDF("id", "text")
      val idx = Index.invertedIndex(docs, "id", "text")
      // "It" tokenizes into the index as "it"; the query-side conversion of
      // "IT" must produce the same bytes, not "ıt".
      val got = Index.conjunctiveQuery(idx, Seq("IT", "TIME")).select("doc").as[Long].collect()
      assert(got.toSeq === Seq(1L))
    }
  }
}
