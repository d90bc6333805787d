package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Aggregation layer mirroring the reference's `AggregationSpecification`
  * (supersonic/cursor/core/aggregate.h:47-158) and its aggregate operator
  * family (GroupAggregate / BestEffortGroupAggregate / AggregateClusters /
  * HybridGroupAggregate / ScalarAggregate / BoundGroupAggregateWithLimit).
  *
  * Functions: SUM MIN MAX COUNT CONCAT FIRST LAST (+ DISTINCT variants)
  * (supersonic/proto/supersonic.proto:91-99). Null rules match the
  * reference (column_aggregator.h:37-42): all ignore NULLs; an all-NULL /
  * empty group yields NULL except COUNT which yields 0.
  *
  * Ordering-dependent aggregations (CONCAT in input order, FIRST, LAST) take
  * an explicit order column because a distributed engine has no stream order
  * — documented semantic gap vs the single-threaded reference (SURVEY §7).
  *
  * At scale: all of these compile to Spark's partial/final HashAggregate —
  * map-side combine happens before the shuffle, exactly the reference's
  * BestEffortGroupAggregate → shuffle → final design (aggregate.h:232-250),
  * and multi-DISTINCT uses Catalyst's Expand rewrite, the same algorithm as
  * the reference's hybrid_group_utils.h NULL-expansion.
  */
object Aggregates {

  sealed trait AggFn
  case object SUM extends AggFn
  case object MIN extends AggFn
  case object MAX extends AggFn
  case object COUNT extends AggFn
  case object CONCAT extends AggFn
  case object FIRST extends AggFn
  case object LAST extends AggFn
  case object ARG_MAX extends AggFn
  case object ARG_MIN extends AggFn

  /** One aggregation: fn(input) AS output.
    * @param input     input column; None only for COUNT (row count)
    * @param distinct  DISTINCT variant (aggregate.h:118-123)
    * @param outType   explicit output type override (aggregate.h:127-145)
    * @param order     explicit order for CONCAT/FIRST/LAST
    * @param sep       CONCAT separator (reference uses ",")
    */
  final case class Agg(fn: AggFn, input: Option[String], output: String,
                       distinct: Boolean = false, outType: Option[DataType] = None,
                       order: Option[Column] = None, sep: String = ",") {
    def toColumn: Column = {
      val in = input.map(col)
      val c = fn match {
        case SUM => if (distinct) sum_distinct(in.get) else sum(in.get)
        case MIN => min(in.get)
        case MAX => max(in.get)
        case COUNT => (in, distinct) match {
          case (Some(i), true)  => count_distinct(i)
          case (Some(i), false) => count(i)
          case (None, _)        => count(lit(1))
        }
        case CONCAT =>
          // Input-order concat: sort (order, value) pairs inside the
          // aggregation buffer, then join — deterministic under shuffle,
          // unlike bare collect_list. DISTINCT dedupes VALUES (reference
          // DistinctAggregator, column_aggregator.cc:308), keeping each
          // value's first occurrence in the explicit order.
          val ord = order.getOrElse(in.get)
          val v = in.get.cast("string")
          val paired = collect_list(struct(ord.as("o"), v.as("v")))
          val values = filter(
            transform(array_sort(paired), x => x.getField("v")), _.isNotNull)
          val deduped = if (distinct) array_distinct(values) else values
          // all-NULL / empty group yields NULL, not "" (column_aggregator.h:37-42)
          when(size(deduped) === 0, lit(null)).otherwise(array_join(deduped, sep))
        case FIRST =>
          val ord = order.getOrElse(in.get)
          min_by(in.get, when(in.get.isNotNull, ord)) // ignore-null FIRST
        case LAST =>
          val ord = order.getOrElse(in.get)
          max_by(in.get, when(in.get.isNotNull, ord))
        // ARG_MAX/ARG_MIN: value of `input` at the extreme of `order`,
        // ties broken DETERMINISTICALLY by the value itself (lexicographic
        // (order, value) struct comparison) — bare max_by leaves ties
        // partition-order-dependent, which a distributed engine must not
        // be. Rows with NULL order or NULL value are ignored (the
        // reference's aggregations-ignore-NULLs rule).
        case ARG_MAX =>
          val ord = order.getOrElse(
            sys.error("ARG_MAX requires an explicit order column"))
          max_by(in.get, when(in.get.isNotNull && ord.isNotNull, struct(ord, in.get)))
        case ARG_MIN =>
          val ord = order.getOrElse(
            sys.error("ARG_MIN requires an explicit order column"))
          min_by(in.get, when(in.get.isNotNull && ord.isNotNull, struct(ord, in.get)))
      }
      outType.map(c.cast).getOrElse(c).as(output)
    }
  }

  /** GroupAggregate — hash aggregation by key columns
    * (reference: aggregate.h:224-228). Empty input ⇒ 0 rows. */
  def groupAggregate(keys: Seq[String], specs: Seq[Agg])(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*).agg(specs.head.toColumn, specs.tail.map(_.toColumn): _*)

  /** BestEffortGroupAggregate — partial aggregation feeding a final merge
    * (reference: aggregate.h:232-250). Spark's HashAggregate already splits
    * partial/final around the shuffle; the user-visible result is identical
    * to groupAggregate, so this is an alias kept for API parity. */
  def bestEffortGroupAggregate(keys: Seq[String], specs: Seq[Agg])(df: DataFrame): DataFrame =
    groupAggregate(keys, specs)(df)

  /** AggregateClusters — streaming aggregation of key-clustered (sorted)
    * input (reference: aggregate.h:279-295). Catalyst picks SortAggregate
    * when the child ordering allows; result is identical. */
  def aggregateClusters(keys: Seq[String], specs: Seq[Agg])(df: DataFrame): DataFrame =
    groupAggregate(keys, specs)(df)

  /** HybridGroupAggregate — external/spillable aggregation incl.
    * multi-DISTINCT (reference: aggregate.h:320-336). Spark's spillable
    * hash agg + RewriteDistinctAggregates(Expand) is the same algorithm. */
  def hybridGroupAggregate(keys: Seq[String], specs: Seq[Agg])(df: DataFrame): DataFrame =
    groupAggregate(keys, specs)(df)

  /** ScalarAggregate — whole-input aggregation, exactly one row even on
    * empty input (reference: aggregate.h:341-345). */
  def scalarAggregate(specs: Seq[Agg])(df: DataFrame): DataFrame =
    df.agg(specs.head.toColumn, specs.tail.map(_.toColumn): _*)

  /** Skew-resistant two-phase aggregation: rows are first aggregated under
    * (keys, random salt ∈ [0, saltBuckets)), spreading a hot key over
    * saltBuckets reducers, then the partials are merged by the bare keys.
    * Correct for the decomposable aggregations (SUM/MIN/MAX/COUNT — the
    * partial of a COUNT is a SUM of partial counts, handled here); CONCAT/
    * FIRST/LAST/DISTINCT are not salt-decomposable and are rejected.
    *
    * At 100 TB this is the difference between one straggler reducer pinned
    * on a hot key and even distribution; AQE's skew handling covers joins,
    * but a skewed groupBy still needs salting.
    */
  def saltedGroupAggregate(keys: Seq[String], specs: Seq[Agg], saltBuckets: Int = 16)
                          (df: DataFrame): DataFrame = {
    require(specs.forall(a => Set[AggFn](SUM, MIN, MAX, COUNT).contains(a.fn) && !a.distinct),
      "saltedGroupAggregate supports non-distinct SUM/MIN/MAX/COUNT only")
    val salted = df.withColumn("__salt",
      (rand(42L) * saltBuckets).cast("int"))
    val partial = groupAggregate(keys :+ "__salt", specs)(salted)
    val merge = specs.map { a =>
      val c = a.fn match {
        case SUM | COUNT => sum(col(a.output))
        case MIN => min(col(a.output))
        case MAX => max(col(a.output))
        case _ => throw new IllegalStateException("unreachable")
      }
      c.as(a.output)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-resistant per-key value collection (SORTED output) — the
    * aggregation class where salting GENUINELY matters, unlike the
    * decomposable SUM/MIN/MAX/COUNT family (see BASELINE.md's skew A/B):
    * collect_list has no map-side reduction — every row of a hot key
    * travels to, and folds inside, ONE reducer's object-hash buffer.
    * Stage 1 collects per (keys, salt), spreading a hot key's rows over
    * `saltBuckets` reducers; stage 2 flattens the ≤ saltBuckets partial
    * arrays per key and sorts. Output equals sort_array(collect_list(v))
    * — SORTED, because arrival order is nondeterministic in any
    * distributed plan, so a sorted contract is also what makes the
    * result reproducible/testable. The hot key's final row still holds
    * all its values (that is the operator's semantics); what salting
    * fixes is the per-row aggregation funnel, which is where the reducer
    * time goes. */
  def saltedCollectSorted(keys: Seq[String], valueCol: String, out: String,
                          saltBuckets: Int = 16)(df: DataFrame): DataFrame = {
    require(saltBuckets > 0, "saltedCollectSorted: saltBuckets must be positive")
    df.withColumn("__salt", (rand(42L) * saltBuckets).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as(out))
  }

  // ===== Multi-dimensional aggregation (ROLLUP / CUBE / GROUPING SETS /
  // PIVOT) — the OLAP subtotal family. The reference's aggregation layer
  // (supersonic/cursor/core/aggregate.h) computes one grouping at a time;
  // a caller wanting subtotals re-runs the aggregation per level and
  // unions. Spark plans all levels in ONE pass: an Expand node replicates
  // each row once per grouping set BEFORE the partial aggregate, so
  // map-side combine still applies and the shuffle moves partials, not
  // raw×levels rows — the right shape at 100 TB.

  /** ROLLUP — hierarchical subtotals (k1..kn), (k1..kn-1), …, (). The
    * grouping-id output column disambiguates a real NULL key value from a
    * subtotal row: bit i set ⇔ key i aggregated away, first key = most
    * significant bit (Spark's `grouping_id()` and ANSI/DuckDB
    * `GROUPING(k1..kn)` share this convention — verified empirically in
    * the q_rollup oracle). */
  def rollupAggregate(keys: Seq[String], specs: Seq[Agg], gidCol: String = "gid")
                     (df: DataFrame): DataFrame =
    df.rollup(keys.map(col): _*)
      .agg(grouping_id().as(gidCol), specs.map(_.toColumn): _*)

  /** CUBE — subtotals for every key subset (2^n grouping sets). */
  def cubeAggregate(keys: Seq[String], specs: Seq[Agg], gidCol: String = "gid")
                   (df: DataFrame): DataFrame =
    df.cube(keys.map(col): _*)
      .agg(grouping_id().as(gidCol), specs.map(_.toColumn): _*)

  /** GROUPING SETS — explicit list of groupings over `keys`. Sets may be
    * any subsets of `keys` (including the empty grand-total set). */
  def groupingSetsAggregate(sets: Seq[Seq[String]], keys: Seq[String],
                            specs: Seq[Agg], gidCol: String = "gid")
                           (df: DataFrame): DataFrame =
    df.groupingSets(sets.map(_.map(col)), keys.map(col): _*)
      .agg(grouping_id().as(gidCol), specs.map(_.toColumn): _*)

  /** PIVOT — one output column per declared pivot value. The value list is
    * EXPLICIT by design: Spark's list-free overload runs a driver-side
    * distinct scan to discover values, which is both a hidden extra job
    * and unbounded output width at scale. With the list given, Catalyst
    * rewrites to a single conditional aggregation — one pass, one
    * shuffle, no extra job. Output columns are named by value (cast to
    * string); callers alias as needed. */
  def pivotAggregate(keys: Seq[String], pivotCol: String, values: Seq[Any],
                     spec: Agg)(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*).pivot(pivotCol, values).agg(spec.toColumn)

  /** UNPIVOT / melt — the inverse of [[pivotAggregate]]: wide measure
    * columns become (variable, value) long-form rows. Plans as ONE Expand
    * (rows × |values|) with no shuffle and no extra job — the relational
    * equivalent is the |values|-way UNION ALL the q_unpivot oracle
    * replays, which would scan the input |values| times; Expand scans it
    * once. All `values` columns must share a least common type (Spark
    * analysis enforces it — cast first). */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
              varCol: String, valCol: String): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varCol, valCol)

  /** BoundGroupAggregateWithLimit — aggregate the first `limit` unique keys
    * individually; all remaining rows fold into a single overflow group
    * (reference: aggregate.h:264-276).
    *
    * Documented deltas vs the reference (aggregate_groups.cc:326,
    * row_hash_set.cc:501-510): (a) "first" there means INPUT order — a
    * single-stream notion with no distributed analog — so this takes the
    * first `limit` keys in KEY order, the deterministic reading; (b) the
    * reference renders the overflow row's key columns with the
    * (limit+1)-th unique key's value (an artifact of reusing that hash-set
    * row), which misleadingly looks like a real group — here the overflow
    * row carries a NULL key plus `overflowCol` = true. The marker keeps a
    * genuine NULL-key group (kept: NULL sorts first, overflowCol = false)
    * DISTINCT from the overflow row, matching the reference's two-row
    * output where both exist.
    *
    * Distributed and bounded: only the K-th smallest key matters, so we take
    * the first `limit` keys via distinct → orderBy → limit (Spark plans this
    * as TakeOrderedAndProject over a partial/final distinct — no global sort,
    * no unpartitioned Window) and broadcast exactly `limit` keys, never the
    * full distinct-key set. At 100 TB / high-cardinality keys the previous
    * dense_rank-over-everything design funnelled all keys through one task
    * and broadcast them all; this version is O(limit) driver-side.
    */
  def groupAggregateWithLimit(key: String, specs: Seq[Agg], limit: Int,
                              overflowCol: String = "overflow")
                             (df: DataFrame): DataFrame = {
    // First `limit` unique keys in key order, nulls smallest (a NULL group
    // key is a real group in the reference's hash aggregation and sorts
    // first, so it is kept whenever limit >= 1).
    val kept = df.select(col(key).as("__rkey")).distinct()
      .orderBy(col("__rkey").asc_nulls_first).limit(limit)
      .withColumn("__keep", lit(true))
    // Null-safe left join against the bounded kept-set; rows whose key was
    // not kept fold into the single overflow group (NULL key + marker),
    // matching the reference's "rest -> one overflow row" output while
    // keeping a kept NULL-key group distinguishable.
    val tagged = df.join(broadcast(kept), col(key) <=> col("__rkey"), "left")
      .withColumn("__ov", col("__keep").isNull)
      .withColumn("__k", when(!col("__ov"), col(key)))
    tagged.groupBy(col("__k").as(key), col("__ov").as(overflowCol))
      .agg(specs.head.toColumn, specs.tail.map(_.toColumn): _*)
  }

  /** Incremental aggregate MAINTENANCE — update a materialized
    * (key, sum, count) aggregate from a change log WITHOUT rescanning the
    * base data: the 100 TB capability where "re-aggregate the corpus"
    * costs hours but the day's deltas cost seconds. Works because SUM and
    * COUNT are commutative groups (retractable): an insert contributes
    * (+v, +1), a delete (−v, −1), an update is modeled as D + I. MIN/MAX
    * are NOT retractable and are deliberately absent — maintaining them
    * incrementally requires the full value multiset, i.e. a rescan.
    *
    * Cost: one aggregation over the CHANGES (small by premise) + one
    * key exchange to merge with the base aggregate (|keys| rows, not base
    * rows). Sums ride DECIMAL(18,2) so merge order cannot drift a bit.
    * Keys whose count reaches zero vanish (exactly what a recompute would
    * produce). Rows with an op other than I/D are rejected loudly via an
    * ANSI-safe filter contract: they are dropped ONLY if `strict` is
    * false; by default they poison the count with NULL and the caller
    * sees the corrupt group. */
  def incrementalSumCount(baseAgg: DataFrame, changes: DataFrame,
                          keyCols: Seq[String], valueCol: String,
                          opCol: String, strict: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "incrementalSumCount: need at least one key")
    val v = col(valueCol).cast("decimal(18,2)")
    val ch = if (strict) changes else changes.where(col(opCol).isin("I", "D"))
    val delta = ch.groupBy(keyCols.map(col): _*)
      .agg(sum(when(col(opCol) === "I", v)
             .when(col(opCol) === "D", -v)).cast("decimal(28,2)").as("sum_v"),
           sum(when(col(opCol) === "I", 1L)
             .when(col(opCol) === "D", -1L)).as("cnt"))
    baseAgg
      .select(keyCols.map(col) :+
        col("sum_v").cast("decimal(28,2)").as("sum_v") :+ col("cnt"): _*)
      .unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("sum_v")).cast("decimal(28,2)").as("sum_v"),
        sum(col("cnt")).as("cnt"))
      .where(col("cnt") > 0)
  }

  /** Top-N categories + 'OTHER' — the cardinality cap every reporting
    * layer applies before charting a high-cardinality dimension: keep
    * the N categories with the largest measure (deterministic rank:
    * measure desc, category asc), fold the tail into one OTHER row.
    * Two aggregations over category-keyed tables and one top-N rank
    * window over the CATEGORY aggregate (|categories| rows, never
    * facts); the relabel is a broadcast-joined membership test, so the
    * fact-level measure is summed exactly once.
    *
    * Output: (category, measure_sum DECIMAL, n_rows) with at most N+1
    * rows. N must keep the kept-set broadcastable — require()d small. */
  def topNOther(df: DataFrame, catCol: String, measureCol: String,
                n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0 && n <= 100000, s"topNOther: n must be in [1, 100000], got $n")
    val agg = df
      .select(coalesce(col(catCol).cast("string"), lit("NULL")).as("category"),
        col(measureCol).cast("decimal(18,2)").as("__m"))
      .groupBy(col("category"))
      .agg(sum(col("__m")).as("measure_sum"), count(lit(1)).as("n_rows"))
    // round 8: top-N via orderBy+limit (TakeOrderedAndProject — a
    // distributed per-partition heap, no single-reducer rank window; the
    // category aggregate can itself be high-cardinality).
    val kept = agg
      .orderBy(col("measure_sum").desc, col("category").asc)
      .limit(n)
      .select(col("category"))
    agg.join(broadcast(kept.withColumn("__keep", lit(true))),
        Seq("category"), "left")
      .select(when(col("__keep"), col("category")).otherwise(lit("OTHER"))
          .as("category"),
        col("measure_sum"), col("n_rows"))
      .groupBy(col("category"))
      .agg(sum(col("measure_sum")).as("measure_sum"),
        sum(col("n_rows")).as("n_rows"))
  }
}
