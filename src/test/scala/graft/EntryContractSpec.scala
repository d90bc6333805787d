package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants on SparkEntry: the correctness gate only
  * checks queries that have BOTH a `queries` entry and an `oracleSql`
  * entry, so silent key drift (a renamed query, a forgotten oracle) would
  * weaken the gate without failing anything — this spec makes drift fail
  * loudly. */
class EntryContractSpec extends AnyFunSuite {

  /** Queries deliberately without a DuckDB oracle, each with a recorded
    * reason. Growing this set should be a conscious decision. EMPTY since
    * round 4: q_dedup_simhash (the one xxhash64-internal case) became a
    * provable recall gate — equal distinct-token-set pairs must surface
    * at Hamming 0 — with a full oracle. */
  private val RowsOnly = Set.empty[String]

  test("every query has an oracle unless explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == RowsOnly,
      s"queries without oracle SQL beyond the documented rows-only set: ${missing -- RowsOnly}")
  }

  test("no orphaned oracle SQL (oracle without a query never runs)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("no scratch/AB queries leak into the driver contract") {
    assert(!SparkEntry.queries.keySet.exists(_.contains("_ab_")),
      "temporary A/B queries must be removed before shipping")
  }

  test("bench ledger is TOTAL: BASELINE_ROWS.json keys == queries keys, " +
    "every entry carries an sf0.1 row") {
    // The 2x perf gate is only evaluable for queries with a recorded
    // baseline row; round 7 found 31 gates silently unrowed because rows
    // lived in prose. The canonical ledger is machine-readable now and
    // this guard makes a new query without a recorded row fail loudly
    // (add one via tools/baseline_rows.py --fill <bench jsonl>).
    val src = scala.io.Source.fromFile("BASELINE_ROWS.json")
    val txt = try src.mkString finally src.close()
    val keys = "\"(q\\w+)\":\\s*\\{".r.findAllMatchIn(txt)
      .map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- keys
    val stale = keys -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"queries with no baseline row: $missing")
    assert(stale.isEmpty, s"baseline rows for dropped queries: $stale")
    val unrowed = "\"(q\\w+)\":\\s*\\{\\s*\"sf0\\.1_s\":\\s*null".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    assert(unrowed.isEmpty, s"ledger entries without an sf0.1 row: $unrowed")
  }
}
