package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{BinaryExecNode, GlobalLimitExec,
  LocalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec,
  UnaryExecNode, UnionExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Machine-checkable plan audit: builds EVERY `SparkEntry.queries` frame
  * and flags the two physical operators that do not survive a 100 TB
  * scale-up — `CartesianProduct`, and `BroadcastNestedLoopJoin` whose
  * build side can GROW WITH THE DATA. A BNLJ against a
  * bounded-by-construction build side (a scalar aggregate's single row,
  * a LIMIT/top-k, a literal table — the "broadcast 1-row stats frame"
  * pattern used throughout the analytics suite) is the intended O(n)
  * plan and passes. The per-round verdicts assert "no cartesians, no
  * unbounded BNLJ" from manual plan reads; this main is that claim as a
  * command.
  *
  * Boundedness is a conservative structural walk: scalar aggregates,
  * limits and literal scans bound their subtree; unary nodes inherit;
  * joins/unions need all inputs bounded; anything else (file scans,
  * generates over scans) is unbounded. The lint runs on the
  * pre-AQE physical plan (AQE only upgrades sort-merge to broadcast-hash
  * — it never introduces either flagged operator), with subqueries
  * traversed.
  *
  * Usage: runMain graft.PlanLint [sfDir] [query ...]
  * One line per violation + a final `planlint:` summary; exit 1 on any
  * violation outside [[allowlist]]. Building a frame runs any effectful
  * gate setup (streaming gates execute their micro-batches), so the full
  * sweep is an audit tool, not a unit test — a few minutes at sf0.001.
  */
object PlanLint {
  /** Queries whose flagged shape is CONTRACT-bounded — correct, but not
    * provable by the structural walk; value is the reason printed
    * alongside. Four entries, each a broadcast build side whose row
    * count is fixed by the operator's semantics rather than by a plan
    * node the walk can see. */
  val allowlist: Map[String, String] = Map(
    "q_ann_brute" -> ("the broadcast side is the QUERY BATCH (vec_id " +
      "< 10) — brute-force ANN scores a finite query batch by " +
      "contract; the corpus side streams through the loop"),
    "q_knn_classify" -> ("the broadcast side is the TEST BATCH " +
      "(vec_id < 50) — finite classification batch by contract; the " +
      "training corpus streams"),
    "q_fisher_exact" -> ("the broadcast side is the observed-k pmf row " +
      "— exactly one row per 2x2 test by construction (k === a on the " +
      "exploded support); the walk loses boundedness at the " +
      "unique-key ln-factorial lookup joins"),
    "q_naive_bayes" -> ("the broadcast side is the per-class model " +
      "frame — rows = label cardinality, the model itself; " +
      "dimension-bounded by the classifier's contract"))

  private def bounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || bounded(a.child)
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: LocalTableScanExec => true
    // a literal Range (lag tables, bit-position tables) is bounded by
    // the plan text itself as long as it is dimension-sized
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= BigInt(100000)
    case u: UnionExec => u.children.forall(bounded)
    case u: UnaryExecNode => bounded(u.child)
    case b: BinaryExecNode => bounded(b.left) && bounded(b.right)
    case _ => false
  }

  private def offenders(plan: SparkPlan): Seq[String] =
    plan.collectWithSubqueries {
      case c: CartesianProductExec if !bounded(c.left) || !bounded(c.right) =>
        "CartesianProduct(unbounded)"
      case j: BroadcastNestedLoopJoinExec
          if !bounded(j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }) =>
        s"BroadcastNestedLoopJoin(${j.joinType}, unbounded build)"
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    var checked = 0
    var violations = 0
    var allowed = 0
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val hits = offenders(df.queryExecution.sparkPlan)
        checked += 1
        if (hits.nonEmpty) {
          allowlist.get(n) match {
            case Some(why) =>
              allowed += 1
              println(s"[planlint] ALLOWED $n: ${hits.mkString(" + ")} — $why")
            case None =>
              violations += 1
              println(s"[planlint] VIOLATION $n: ${hits.mkString(" + ")}")
          }
        }
      } catch {
        case e: Exception =>
          violations += 1
          println(s"[planlint] ERROR $n: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"planlint: checked=$checked violations=$violations allowed=$allowed")
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}
