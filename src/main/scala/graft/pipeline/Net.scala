package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IPv4 / CIDR log-analytics primitives — the firewall-rule / geo-block
  * enrichment step of an access-log pipeline, as pure codegen column
  * expressions plus a broadcast containment join. Beyond-reference
  * surface (the reference has no network type; its users parse in UDFs —
  * here the parse IS the plan).
  */
object Net {

  /** Dotted-quad IPv4 string → unsigned 32-bit value in a Long. NULL for
    * anything malformed: wrong part count, non-numeric, out-of-range
    * octet. Pure expressions (split + guarded casts) — codegen, no UDF. */
  def ipv4ToLong(ip: Column): Column =
    // native single-pass parser (graft.functions.Ipv4ToLongExpr) — same
    // NULL contract as the composed split+RLIKE form it replaces, but
    // each evaluation is a byte walk, so optimizer-duplicated instances
    // (pushed/inferred isnotnull filters) stop dominating scans
    graft.functions.Ipv4ToLongExpr.ipv4_to_long(ip)

  /** Long → dotted-quad string (the inverse face, for readable output). */
  def longToIpv4(v: Column): Column = {
    val x = v.cast("long")
    concat_ws(".", shiftright(x, 24) % 256L, shiftright(x, 16) % 256L,
      shiftright(x, 8) % 256L, x % 256L)
  }

  /** CIDR containment join: every (ip row, rule) pair where the IPv4
    * address in `ipCol` (dotted-quad string) falls inside the rule's
    * `cidrCol` block ("a.b.c.d/p"). Overlapping rules each match — the
    * caller picks longest-prefix or aggregates as needed.
    *
    * Scale shape: rule tables are dimension-sized (firewall/geo lists),
    * so the rules BROADCAST — no shuffle of the 100 TB log side at all.
    * Each rule pre-explodes to its covering /8 buckets (a /p with p < 8
    * covers 2^(8−p) ≤ 256 buckets; p ≥ 8 exactly one), the join keys on
    * the ip's first octet, and the residual mask test is one integer
    * division: ip div 2^(32−p) = net div 2^(32−p). Malformed ips or
    * rules drop out via NULL. Output: input ip-side columns + (cidr,
    * net, plen). */
  def cidrContainJoin(ips: DataFrame, ipCol: String,
                      rules: DataFrame, cidrCol: String): DataFrame = {
    val parsed = parseRules(rules, cidrCol)
    // No explicit isNotNull filter on the parsed value: the INNER hash
    // join already drops NULL keys and the residual block test is
    // NULL-rejecting, so the filter was semantically redundant — and
    // expensively so: predicate pushdown substituted the full
    // parse-chain alias into the filter, inlining the ip construction
    // ~20x per row (4 RLIKEs per reference; measured 7 s/100k rows at
    // sf0.1 vs 0.7 s for one parse pass). Malformed ips still drop out,
    // now via the join's own NULL rejection at one parse per row.
    val probe = ips.withColumn("__ipv", ipv4ToLong(col(ipCol)))
      .withColumn("__b", expr("__ipv div 16777216L"))
    probe.join(broadcast(parsed), Seq("__b"))
      .where(expr("__ipv div __bsz") === expr("net div __bsz"))
      .drop("__b", "__bsz", "__net")
  }

  /** Rules parsed + canonicalized + exploded to covering /8 buckets (the
    * shared candidate structure of both joins). */
  private def parseRules(rules: DataFrame, cidrCol: String): DataFrame =
    rules.select(col(cidrCol).as("cidr"),
        ipv4ToLong(split(col(cidrCol), "/").getItem(0)).as("__net"),
        split(col(cidrCol), "/").getItem(1).cast("int").as("plen"))
      .where(col("__net").isNotNull && col("plen").between(0, 32))
      // canonical network base: zero the host bits so sloppy rules
      // ("1.2.3.4/24") still mean their block
      .withColumn("__bsz", expr("CAST(pow(2, 32 - plen) AS BIGINT)"))
      .withColumn("net", expr("(__net div __bsz) * __bsz"))
      .withColumn("__b", explode(sequence(
        expr("net div 16777216L"),
        expr("(net + __bsz - 1) div 16777216L"))))

  /** LONGEST-PREFIX-MATCH enrichment: each ip row gets THE most specific
    * matching rule (max plen; ties — duplicate rules for the same block —
    * break by cidr string ascending), or NULL columns when nothing
    * matches (LEFT semantics — real firewall/geo enrichment keeps the
    * unmatched traffic visible). This is what rule lookup actually means
    * in routing tables; [[cidrContainJoin]] stays the all-matches face.
    *
    * Scale shape: STRICTLY better than "containment join then max_by per
    * row" — that plan explodes one row per matching rule and pays a
    * row-keyed aggregation exchange to re-collapse. Here the broadcast
    * side is pre-grouped per /8 bucket into an array of (plen desc,
    * cidr asc)-sorted rule structs, the probe joins on its first octet
    * (exactly ONE broadcast-hash match per row, no explosion), and the
    * winner is found by [[graft.functions.CidrFirstMatch]] — a codegen'd
    * first-match walk that STOPS at the first (= most specific) matching
    * rule instead of the interpreted full-bucket `filter(...)` HOF scan
    * it replaced in round 9 (a hot /8 holding thousands of routing-table
    * prefixes made the no-short-circuit scan the per-row bottleneck).
    * The 100 TB log side is never shuffled, never duplicated, and emits
    * exactly one output row per input row. */
  def cidrLpmJoin(ips: DataFrame, ipCol: String,
                  rules: DataFrame, cidrCol: String): DataFrame = {
    // struct field order IS the sort key: sort_array on structs compares
    // lexicographically, so (negp, cidr, ...) = plen desc then cidr asc
    val perBucket = parseRules(rules, cidrCol)
      .groupBy(col("__b"))
      .agg(sort_array(collect_list(struct(
        (-col("plen")).as("negp"), col("cidr"),
        expr("net div __bsz").as("netd"), col("__bsz").as("bsz"),
        col("net"), col("plen")))).as("__rules"))
    val probe = ips.withColumn("__ipv", ipv4ToLong(col(ipCol)))
      .withColumn("__b", expr("__ipv div 16777216L"))
    probe.join(broadcast(perBucket), Seq("__b"), "left")
      .withColumn("__midx", graft.functions.CidrExpressions.cidr_first_match(
        col("__rules"), col("__ipv"), netdOrdinal = 2, bszOrdinal = 3))
      .withColumn("__m", expr("element_at(__rules, __midx)"))
      .select(ips.columns.map(col(_)) ++ Seq(
        col("__m.cidr").as("cidr"), col("__m.net").as("net"),
        col("__m.plen").as("plen")): _*)
  }
}
