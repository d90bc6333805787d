package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-check report a
  * pipeline runs before it trusts a 100 TB drop (the Deequ / dbt-test
  * shape): each check yields one row (check, violations, pass), so the
  * report is tiny whatever the input size.
  *
  * Execution shape: every ROW-LOCAL check (not-null, range, accepted
  * values) folds into ONE wide aggregate — a single scan however many
  * such checks run; uniqueness adds one distinct-count pass over its key
  * columns and referential integrity one broadcast-or-shuffled anti-join
  * per parent — each the minimal plan for its contract. Nothing ever
  * collects rows to the driver; the violation COUNT is the report, and a
  * caller who wants the violating rows re-runs the single predicate as a
  * filter.
  */
object Checks {

  sealed trait Check { def name: String }
  /** violations = rows where `col` IS NULL. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** violations = non-null rows outside [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col, $lo, $hi)"
  }
  /** violations = non-null rows with a value outside `values`. */
  case class Accepted(col: String, values: Seq[String]) extends Check {
    def name = s"accepted($col)"
  }
  /** violations = rows beyond the first per key = count − distinct keys
    * (rows with any NULL key column are exempt — a NULL key is
    * [[NotNull]]'s contract, not uniqueness's). */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** violations = child rows whose (fully non-null) foreign key has no
    * match in `parent` — the classic orphan count. */
  case class RefIntegrity(fkCols: Seq[String], parent: DataFrame,
                          pkCols: Seq[String]) extends Check {
    require(fkCols.size == pkCols.size,
      "RefIntegrity: fk and pk column lists must align")
    def name = s"ref_integrity(${fkCols.mkString(",")})"
  }

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate: need at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = checks.collect {
      case c @ NotNull(col0) =>
        c.name -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.name -> sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
      case c @ Accepted(col0, vs) =>
        c.name -> sum(when(col(col0).isNotNull &&
          !col(col0).isin(vs: _*), 1L).otherwise(0L))
    }
    val wide: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val aggs = rowLocal.map { case (n, c) => coalesce(c, lit(0L)).as(n) }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Seq(one.select(explode(array(rowLocal.map { case (n, _) =>
          struct(lit(n).as("check"), col(s"`$n`").as("violations"))
        }: _*)).as("r")).select(col("r.check"), col("r.violations")))
      }
    val relational: Seq[DataFrame] = checks.collect {
      case c @ Unique(cols0) =>
        val keyed = df.where(cols0.map(col(_).isNotNull).reduce(_ && _))
        keyed.agg((count(lit(1)) -
            count_distinct(struct(cols0.map(col): _*))).as("violations"))
          .select(lit(c.name).as("check"),
            coalesce(col("violations"), lit(0L)).as("violations"))
      case c @ RefIntegrity(fk, parent, pk) =>
        val child = df.where(fk.map(col(_).isNotNull).reduce(_ && _))
          .select(fk.map(col): _*)
        val p = parent.select(pk.zip(fk).map { case (pc, fc) => col(pc).as(fc) }: _*)
        child.join(p, fk, "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("check"),
            coalesce(col("violations"), lit(0L)).as("violations"))
    }
    (wide ++ relational).reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Noisy count release via the two-sided geometric mechanism — the
    * differential-privacy-SHAPED aggregate (Ghosh–Roughgarden–Sundararajan
    * 2009: noise = G1 − G2 with Gi geometric on {0,1,…}, success 1−alpha,
    * which is the discrete Laplace with ε = −ln alpha). The noise here is
    * SEEDED — a pure function of (group value, seed) via the portable
    * shuffle key — so releases are reproducible across runs, retries, and
    * engines, and the whole mechanism replays in SQL. True DP requires
    * secret randomness; swap the seed for one and the mechanism (and its
    * ε accounting) is unchanged — the operator is the release PLUMBING.
    *
    * Geometric inverse-CDF: G = floor(ln(1−u)/ln alpha) with
    * u = (shuffleKey + 0.5)/2^31 ∈ (0,1); the ratio is rounded 9 dp
    * before floor so a 1-ulp libm difference between engines cannot flip
    * the floor. One aggregation shuffle; noise is a projection over the
    * group table. Group values must be non-negative integers (the
    * portable-hash domain). */
  def noisyCounts(df: DataFrame, groupCol: String, alpha: Double,
                  seed: Long): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "noisyCounts: alpha must be in (0,1)")
    def geo(s: Long): Column = {
      val u = (Sampling.shuffleKey(Seq(col(groupCol)), s).cast("double") +
        lit(0.5)) / lit(2147483648.0)
      floor(round(log(lit(1.0) - u) / log(lit(alpha)), 9)).cast("long")
    }
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
      .select(col(groupCol),
        (col("__c") + geo(seed) - geo(seed + 1)).as("noisy_count"))
  }

  /** k-anonymity risk report over a set of quasi-identifier columns —
    * the re-identification audit a dataset release runs: every
    * equivalence class (distinct quasi-identifier combination) smaller
    * than k is a privacy risk. One quasi-key aggregation shuffle, then a
    * 1-row fold over the class sizes (|classes| rows, never raw rows):
    * (k, n_rows, n_classes, classes_below_k, rows_below_k,
    * min_class_size, max_class_size, anonymous) — `anonymous` is the
    * pass/fail verdict (no class below k). NULL quasi-values group as a
    * class of their own (NULL-safe groupBy), matching how an attacker
    * would treat a missing value: as one more observable. */
  /** Functional-dependency audit: does lhs → rhs hold (every lhs value
    * maps to exactly one rhs value)? The schema-discovery / data-quality
    * probe behind "is this column a key for that one". One aggregate over
    * the DISTINCT (lhs, rhs) pairs — NULL rhs counts as a value (a key
    * mapping to both 7 and NULL is a violation); violating_groups is the
    * number of lhs values with >1 distinct rhs, max_rhs_per_lhs the worst
    * fan-out. Both exchanges are key-sharded aggregates; nothing collects.
    * One report row per call — stack calls with unionByName for a suite. */
  def functionalDependency(df: DataFrame, lhsCols: Seq[String],
                           rhsCol: String, name: String): DataFrame = {
    require(lhsCols.nonEmpty, "functionalDependency: need lhs columns")
    val pairs = df.select((lhsCols.map(col) :+ col(rhsCol)): _*).distinct()
    pairs.groupBy(lhsCols.map(col): _*).agg(count(lit(1)).as("__n_rhs"))
      .agg(count(lit(1)).as("lhs_groups"),
        coalesce(sum(when(col("__n_rhs") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("violating_groups"),
        coalesce(max(col("__n_rhs")), lit(0L)).as("max_rhs_per_lhs"))
      .select(lit(name).as("check_name"), col("lhs_groups"),
        col("violating_groups"), col("max_rhs_per_lhs"),
        (col("violating_groups") === 0L).as("holds"))
  }

  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need at least one quasi-identifier")
    require(k >= 1, "kAnonymity: k must be >= 1")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_classes"),
        sum(when(col("__c") < k, 1L).otherwise(0L)).as("classes_below_k"),
        sum(when(col("__c") < k, col("__c")).otherwise(0L)).as("rows_below_k"),
        min(col("__c")).as("min_class_size"),
        max(col("__c")).as("max_class_size"))
      .select(lit(k).as("k"), col("n_rows"), col("n_classes"),
        col("classes_below_k"), col("rows_below_k"),
        col("min_class_size"), col("max_class_size"),
        (col("classes_below_k") === 0L).as("anonymous"))
  }

  /** Benjamini-Hochberg FDR control over a p-value column — the
    * multiple-testing gate any metrics pipeline needs once it runs
    * thousands of A/B comparisons: rank p ascending (ties broken by id
    * for an engine-exact total order), find the largest rank k with
    * p ≤ k·q/m, and flag everything at rank ≤ k significant (the
    * standard step-up rule; when no rank qualifies nothing is flagged).
    * The global rank uses the distributed distinct-value pattern (per-p
    * counts, prefix over the distinct-p table, within-p rank sharded by
    * p); m and k* are broadcast scalars; the threshold comparison is one
    * fixed dag over exact integers and the raw p doubles. Output: (id,
    * p, rank, bh_threshold, significant). */
  def benjaminiHochberg(df: DataFrame, idCol: String, pCol: String,
                        q: Double): DataFrame = {
    require(q > 0 && q < 1, "benjaminiHochberg: q must be in (0, 1)")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("id"), col(pCol).as("p"))
      .where(col("p").isNotNull)
    val perP = rows.groupBy("p").agg(count(lit(1)).as("__c"))
    // two-level distributed prefix (Profile.prefixOffsets): p-values are
    // often ALL distinct, so a single global window over the distinct-p
    // table would be one dead core at corpus scale (measured 7.3x wall
    // at 10x data with the naive window)
    val offs = Profile.prefixOffsets(perP, "p", "__c", ascending = true)
    val wIn = Window.partitionBy(col("p")).orderBy(col("id").asc)
    val total = rows.agg(count(lit(1)).as("__m"))
    val ranked = rows.join(offs, Seq("p"))
      .withColumn("rank", col("__off") + row_number().over(wIn))
      .crossJoin(broadcast(total))
      .withColumn("bh_threshold",
        col("rank").cast("double") * lit(q) / col("__m").cast("double"))
      .withColumn("__ok", col("p") <= col("bh_threshold"))
    val kStar = ranked.agg(max(when(col("__ok"), col("rank"))).as("__k"))
    ranked.crossJoin(broadcast(kStar))
      .select(col("id"), col("p"), col("rank"), col("bh_threshold"),
        (col("__k").isNotNull && col("rank") <= col("__k")).as("significant"))
  }

  /** l-diversity audit — the companion privacy check to [[kAnonymity]]:
    * a quasi-identifier class can be large (k-anonymous) yet still leak
    * if every member shares the same SENSITIVE value; distinct-l
    * diversity requires ≥ l distinct sensitive values per class. One
    * aggregation produces the class table (size + distinct sensitive
    * count — NULL sensitive values don't count as a value, standard
    * count-distinct semantics), then a single fold reports the audit.
    * The report is one row whatever the input size. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity: need at least one quasi-identifier")
    require(l >= 1, "lDiversity: l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__c"),
        count_distinct(col(sensitiveCol)).as("__d"))
      .agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_classes"),
        sum(when(col("__d") < l, 1L).otherwise(0L)).as("classes_below_l"),
        sum(when(col("__d") < l, col("__c")).otherwise(0L)).as("rows_below_l"),
        min(col("__d")).as("min_diversity"),
        max(col("__d")).as("max_diversity"))
      .select(lit(l).as("l"), col("n_rows"), col("n_classes"),
        col("classes_below_l"), col("rows_below_l"),
        col("min_diversity"), col("max_diversity"),
        (col("classes_below_l") === 0L).as("diverse"))
  }

  /** Order-independent table fingerprint — the replication/anti-entropy
    * audit: every row folds to a 48-bit integer (md5 of the '|'-joined
    * canonical column strings, NULL marked distinctly), summed as
    * DECIMAL(38,0). Row order, partitioning and engine cannot change the
    * sum, so two replicas compare by exchanging ONE (count, fingerprint)
    * row instead of data. Callers must pass columns with portable string
    * forms (integers, strings, decimals — NOT raw doubles, whose
    * to-string differs across engines). Output: (n_rows, fingerprint as
    * a digit string). */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint: need at least one column")
    val rowStr = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("<NULL>"))): _*)
    df.select(conv(substring(md5(rowStr), 1, 12), 16, 10)
        .cast("long").as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("fingerprint"))
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * for monetary columns: observed first-significant-digit counts vs
    * Benford's log₁₀(1 + 1/d) expectation, with the chi-square
    * contribution per digit. The digit is extracted from the DECIMAL's
    * exact digit STRING (never via log10/power, whose boundary ulps
    * differ across engines): cast to DECIMAL(18,2), string-strip sign
    * and leading "0."s, take the first character. Values rounding to 0
    * are excluded (no significant digit). Expected fractions and the
    * χ² terms are fixed double dags over exact counts, rounded 6 dp.
    *
    * One digit-keyed aggregation (9 groups) over a codegen'd
    * projection — nothing else. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(regexp_replace(
      abs(col(valueCol).cast("decimal(18,2)")).cast("string"),
      "^0\\.0*", ""), 1, 1)
    val counts = df
      .select(digit.as("digit"))
      .where(col("digit").isin((1 to 9).map(_.toString): _*))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    val expected = round(
      log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)), 6)
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("observed_frac"),
        expected.as("benford_frac"),
        round(
          (col("n").cast("double") - col("__t").cast("double") * expected) *
          (col("n").cast("double") - col("__t").cast("double") * expected) /
          (col("__t").cast("double") * expected), 6).as("chi2_term"))
  }

  /** Inclusion-dependency (foreign-key candidate) audit: how much of
    * `child.childCol`'s DISTINCT value set is contained in
    * `parent.parentCol` — the schema-discovery probe ("is this column a
    * FK of that one?") and the referential-integrity health number.
    * Both sides reduce to distinct-value tables BEFORE the anti-join
    * (at 100 TB the dedup is the big reduction); NULLs are excluded
    * (they reference nothing). Output: one row
    * (n_child_distinct, n_missing, containment 6 dp; containment NULL
    * when the child has no non-NULL values). */
  def inclusionDependency(child: DataFrame, childCol: String,
                          parent: DataFrame, parentCol: String): DataFrame = {
    val cv = child.where(col(childCol).isNotNull)
      .select(col(childCol).as("__v")).distinct()
    val pv = parent.where(col(parentCol).isNotNull)
      .select(col(parentCol).as("__v")).distinct()
    val miss = cv.join(pv, Seq("__v"), "left_anti")
      .agg(count(lit(1)).as("n_missing"))
    cv.agg(count(lit(1)).as("n_child_distinct"))
      .crossJoin(broadcast(miss))
      .select(col("n_child_distinct"), col("n_missing"),
        when(col("n_child_distinct") > 0, round(
          lit(1.0) - col("n_missing").cast("double") /
            col("n_child_distinct").cast("double"), 6)).as("containment"))
  }

  /** Two-table aggregate reconciliation — the finance-ops "do the books
    * agree" audit: per key, each side's exact DECIMAL sum and row count,
    * their difference, and a status — `match` (|diff| ≤ tol),
    * `mismatch`, `left_only`, `right_only`. One aggregation per side
    * (each keyed — the giant inputs reduce to one row per key BEFORE
    * the join) and one key-sharded full-outer join of the two small
    * aggregates. Sums go to doubles through the digit string; the
    * tolerance compare happens in exact decimals. */
  def reconcile(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftValCol: String, rightValCol: String,
                tol: BigDecimal): DataFrame = {
    require(keyCols.nonEmpty, "reconcile: need at least one key column")
    require(tol >= 0, "reconcile: tolerance must be >= 0")
    def d(c: Column) = c.cast("string").cast("double")
    val ks = keyCols.map(col)
    val l = left.groupBy(ks: _*)
      .agg(sum(col(leftValCol).cast("decimal(18,2)")).as("__ls"),
        count(lit(1)).as("l_rows"))
    val r = right.groupBy(ks: _*)
      .agg(sum(col(rightValCol).cast("decimal(18,2)")).as("__rs"),
        count(lit(1)).as("r_rows"))
    val diff = coalesce(col("__ls"), lit(0).cast("decimal(18,2)")) -
      coalesce(col("__rs"), lit(0).cast("decimal(18,2)"))
    l.join(r, keyCols, "full_outer")
      .select((ks :+ coalesce(col("l_rows"), lit(0L)).as("l_rows") :+
        coalesce(col("r_rows"), lit(0L)).as("r_rows") :+
        d(col("__ls")).as("l_sum") :+ d(col("__rs")).as("r_sum") :+
        d(diff).as("diff") :+
        when(col("l_rows").isNull, "right_only")
          .when(col("r_rows").isNull, "left_only")
          .when(abs(diff) <= lit(tol.underlying), "match")
          .otherwise("mismatch").as("status")): _*)
  }

  /** Luhn (mod-10) checksum validity of an all-digit string column — the
    * card/IMEI/id-format audit. From the RIGHT, every second digit
    * doubles (minus 9 past 9); valid ⟺ the sum ≡ 0 (mod 10). One
    * higher-order-function expression over the digit positions — works
    * for any length, stays in codegen'd column land (no UDF). NULL for
    * NULL/empty/non-digit input. */
  /** Gaps in an integer sequence per key — the completeness audit for
    * anything that should be dense (invoice numbers, offsets, shard
    * indexes): one row per hole, (key, gap_start, gap_end, n_missing).
    * Duplicates collapse first (a repeated id is not a gap); one
    * key-sharded lag window over the distinct ids. */
  def sequenceGaps(df: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__s").asc)
    df.select(col(keyCol).as("__k"), col(seqCol).cast("long").as("__s"))
      .where(col("__s").isNotNull).distinct()
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .where(col("__prev").isNotNull && col("__s") - col("__prev") > 1)
      .select(col("__k").as("key"), (col("__prev") + 1).as("gap_start"),
        (col("__s") - 1).as("gap_end"),
        (col("__s") - col("__prev") - 1).as("n_missing"))
  }

  def luhnValid(s: Column): Column = {
    val digitsOk = s.rlike("^[0-9]+$")
    val total = aggregate(
      transform(sequence(lit(1), length(s)), i => {
        val d = s.substr(i, lit(1)).cast("int")
        when((length(s) - i) % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    when(digitsOk, total % 10 === 0)
  }
}
