package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted text index — the build side of keyword retrieval over a
  * document corpus (the posting-list organization every search engine and
  * every RAG pre-filter uses; complements Scoring.tfidfBm25, which ranks
  * what this retrieves).
  *
  * Scale posture: the index IS a DataFrame keyed by term — write it
  * bucketed by term (Relational.bucketedWrite) and conjunctive queries
  * become co-located probes with zero build-side exchange. Posting lists
  * stay relational (term, doc) rows rather than array-typed lists, so a
  * hot term (stopword) shards across partitions instead of materializing
  * one giant array row; `withDf = true` attaches document frequencies so
  * callers can probe rarest-term-first.
  */
object Index {

  /** Build the inverted index: one (term, doc) row per DISTINCT term
    * occurrence, plus that term's document frequency when `withDf`.
    * One explode (partition-local) + one distinct exchange on
    * (term, doc); the df count reuses the term key. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    withDf: Boolean = true): DataFrame = {
    val posting = docs
      .select(col(idCol).as("doc"), explode(Scoring.tokenize(col(textCol))).as("term"))
      .distinct()
    if (!withDf) posting.select("term", "doc")
    else {
      val dfreq = posting.groupBy("term").agg(count(lit(1)).as("df"))
      posting.join(dfreq, Seq("term")).select("term", "doc", "df")
    }
  }

  /** Conjunctive (AND) query over the index: documents containing EVERY
    * term in `terms`. The probe filters the index to the query terms
    * (pushed-down IN over the term key — with a term-bucketed index this
    * prunes to k buckets), then one groupBy(doc) HAVING count = k; no
    * join at all, and the aggregation input is only the query terms'
    * postings — the smallest-list-first bound that makes conjunctive
    * retrieval cheap. */
  def conjunctiveQuery(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "conjunctiveQuery: need at least one term")
    val distinctTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    index.where(col("term").isin(distinctTerms: _*))
      .select("term", "doc").distinct()
      .groupBy("doc").agg(count(lit(1)).as("__hits"))
      .where(col("__hits") === distinctTerms.size)
      .select("doc")
  }

  /** Positional postings: one row per token OCCURRENCE — (term, doc,
    * pos) with pos the 0-based token index. The phrase/proximity face of
    * [[invertedIndex]] (which stores presence only); ~corpus-token-count
    * rows, term-keyed so hot terms shard under AQE like the tf path. */
  def positionalIndex(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(Scoring.tokenize(col(textCol))))
      .toDF("doc", "pos", "term")

  /** Exact phrase search over a positional index: documents where the
    * query terms occur CONSECUTIVELY, with the match count (overlapping
    * matches all count — position arithmetic, not substring replace).
    *
    * Plan: filter the postings to the first term, then one equi-join per
    * remaining term on (doc, pos − offset) — each join moves only that
    * term's postings (the IN-filter pushes to the index scan; with a
    * term-bucketed stored index this prunes to k buckets), never the
    * corpus. Rare-term-first ordering is the classic optimization —
    * callers can pre-rotate the phrase; positions keep the offsets
    * correct regardless of join order. Output: (doc, n_matches > 0). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: need at least one term")
    val terms = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val post = positionalIndex(docs, idCol, textCol)
    val base = post.where(col("term") === terms.head)
      .select(col("doc"), col("pos"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(base) {
      case (acc, (t, j)) =>
        acc.join(post.where(col("term") === t)
          .select(col("doc"), (col("pos") - j).as("pos")), Seq("doc", "pos"))
    }
    matched.groupBy(col("doc")).agg(count(lit(1)).as("n_matches"))
  }
}
