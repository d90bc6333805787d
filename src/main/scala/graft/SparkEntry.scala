package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Relational}
import graft.operators.Aggregates._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` exercises a declared operator from SURVEY.md §2
  * through the graft.operators / graft.functions API, and (where
  * SQL-expressible) has a DuckDB oracle in `oracleSql` with identical output
  * column names and ORDER BY.
  *
  * Exactness convention: raw parquet values pass through both engines
  * bit-identically; computed monetary aggregates are done in DECIMAL(18,2)
  * (exact) and cast to DOUBLE at the end, so Spark and DuckDB hashes match
  * without tolerance.
  */
object SparkEntry {

  /** money-exact decimal cast */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def asDouble(names: String*)(df: DataFrame): DataFrame =
    names.foldLeft(df)((d, n) => d.withColumn(n, col(n).cast("double")))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // =========================================================================
  // Relational core (SURVEY §2.1–2.6)
  // =========================================================================

  private def q1Agg(s: SparkSession, d: String): DataFrame = {
    // TPC-H Q1 shape: Filter → Compute → GroupAggregate → Sort.
    val li = Tables.lineitem(s, d)
    val prepped = Relational.compute(
      col("l_returnflag"), col("l_linestatus"),
      dec(col("l_quantity")).as("qty"),
      dec(col("l_extendedprice")).as("price"),
      (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).as("disc_price")
    )(Relational.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))(li))
    val agg = Aggregates.groupAggregate(Seq("l_returnflag", "l_linestatus"), Seq(
      Agg(SUM, Some("qty"), "sum_qty"),
      Agg(SUM, Some("price"), "sum_base_price"),
      Agg(SUM, Some("disc_price"), "sum_disc_price"),
      Agg(COUNT, None, "count_order")))(prepped)
    Relational.sort(col("l_returnflag"), col("l_linestatus"))(
      asDouble("sum_qty", "sum_base_price", "sum_disc_price")(agg))
  }

  private def qFilterProject(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val f = Relational.filter(col("l_quantity") >= 45 && col("l_returnflag") === "A")(li)
    Relational.sort(col("l_orderkey"), col("l_linenumber"))(
      Relational.project(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))(f))
  }

  private def qLimitOffset(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    Relational.limitOffset(20, 50)(
      Relational.sort(col("l_orderkey"), col("l_linenumber"))(
        Relational.project(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))(li)))
  }

  private def qSortTopK(s: SparkSession, d: String): DataFrame = {
    // ExtendedSort: case-insensitive key + top-k.
    val p = Tables.part(s, d)
    Relational.extendedSort(
      Seq(Relational.caseInsensitive(col("p_type")), col("p_retailprice").desc, col("p_partkey")),
      limit = Some(10))(p)
      .select(col("p_partkey"), col("p_type"), col("p_retailprice"))
  }

  private def qHashJoinInner(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val j = Relational.hashJoin(o, c, col("o_custkey") === col("c_custkey"),
      broadcastRight = true)
    val agg = Aggregates.groupAggregate(Seq("c_mktsegment"), Seq(
      Agg(COUNT, None, "n_orders"),
      Agg(MIN, Some("o_totalprice"), "min_price"),
      Agg(MAX, Some("o_totalprice"), "max_price")))(j)
    Relational.sort(col("c_mktsegment"))(agg)
  }

  private def qHashJoinLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val j = Relational.hashJoin(c, o, col("c_custkey") === col("o_custkey"), "left_outer")
    val agg = Aggregates.groupAggregate(Seq("c_custkey"), Seq(
      Agg(COUNT, Some("o_orderkey"), "n_orders"),
      Agg(SUM, Some("o_totalprice_dec"), "sum_price")))(
      j.withColumn("o_totalprice_dec", dec(col("o_totalprice"))))
    Relational.sort(col("c_custkey"))(asDouble("sum_price")(agg))
  }

  private def qForeignFilter(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val big = Relational.filter(col("o_totalprice") > 150000.0)(Tables.orders(s, d))
    Relational.sort(col("l_orderkey"), col("l_linenumber"))(
      Relational.foreignFilter(li, "l_orderkey", big, "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
  }

  private def qRowidMergeJoin(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).withColumn("n_regionkey64", col("n_regionkey").cast("long"))
    val r = Tables.region(s, d)
    Relational.sort(col("n_nationkey"))(
      Relational.rowidMergeJoin(n, "n_regionkey64", r, Seq(col("r_regionkey")))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
  }

  private def qCoalesce(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val left = c.select(col("c_custkey"), col("c_name"))
    val right = c.select(col("c_acctbal"), col("c_mktsegment"))
    Relational.sort(col("c_custkey"))(Relational.coalesceColumns(Seq(left, right)))
  }

  private def qMergeUnion(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def side(flag: String) =
      li.filter(col("l_returnflag") === flag)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    Relational.mergeUnionAll(Seq(side("A"), side("R")),
      Seq(col("l_orderkey"), col("l_linenumber")))
  }

  private def qGenerate(s: SparkSession, d: String): DataFrame =
    Relational.compute(col("seq"), lit(42).as("c_int"), lit("x").as("c_str"))(
      Relational.generate(s, 10)).orderBy("seq")

  private def qScalarAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).withColumn("qty_dec", dec(col("l_quantity")))
    asDouble("s")(Aggregates.scalarAggregate(Seq(
      Agg(COUNT, None, "cnt"),
      Agg(SUM, Some("qty_dec"), "s"),
      Agg(MIN, Some("l_quantity"), "mn"),
      Agg(MAX, Some("l_quantity"), "mx")))(li))
  }

  private def qScalarAggEmpty(s: SparkSession, d: String): DataFrame = {
    // ScalarAggregate returns exactly one row on empty input
    // (reference: aggregate_scalar.cc); COUNT→0, others→NULL.
    val li = Tables.lineitem(s, d).filter(col("l_quantity") < 0)
      .withColumn("qty_dec", dec(col("l_quantity")))
    asDouble("s")(Aggregates.scalarAggregate(Seq(
      Agg(COUNT, None, "cnt"),
      Agg(SUM, Some("qty_dec"), "s"),
      Agg(MIN, Some("l_quantity"), "mn")))(li))
  }

  private def qGroupDistinct(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    Relational.sort(col("l_returnflag"))(
      Aggregates.hybridGroupAggregate(Seq("l_returnflag"), Seq(
        Agg(COUNT, Some("l_suppkey"), "nd_supp", distinct = true),
        Agg(SUM, Some("l_linenumber"), "sd_ln", distinct = true),
        Agg(COUNT, Some("l_orderkey"), "nd_ord", distinct = true)))(li))
  }

  private def qAggConcat(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_custkey") <= 50)
    Relational.sort(col("c_nationkey"))(
      Aggregates.groupAggregate(Seq("c_nationkey"), Seq(
        Agg(CONCAT, Some("c_name"), "names", order = Some(col("c_custkey"))),
        Agg(COUNT, None, "cnt")))(c))
  }

  private def qFirstLast(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("ord", col("l_orderkey") * 10 + col("l_linenumber"))
    Relational.sort(col("l_returnflag"))(
      Aggregates.groupAggregate(Seq("l_returnflag"), Seq(
        Agg(FIRST, Some("l_quantity"), "first_qty", order = Some(col("ord"))),
        Agg(LAST, Some("l_quantity"), "last_qty", order = Some(col("ord")))))(li))
  }

  private def qAggLimit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).withColumn("qty_dec", dec(col("l_quantity")))
    asDouble("sum_qty")(
      Aggregates.groupAggregateWithLimit("l_suppkey", Seq(
        Agg(SUM, Some("qty_dec"), "sum_qty"),
        Agg(COUNT, None, "cnt")), limit = 5)(li))
      .orderBy(col("l_suppkey").asc_nulls_last)
  }

  private def qSetIntersect(s: SparkSession, d: String): DataFrame =
    Relational.sort(col("nk"))(Relational.intersect(
      Tables.customer(s, d).select(col("c_nationkey").as("nk")),
      Tables.supplier(s, d).select(col("s_nationkey").as("nk"))))

  private def qSetExcept(s: SparkSession, d: String): DataFrame =
    Relational.sort(col("nk"))(Relational.except(
      Tables.customer(s, d).select(col("c_nationkey").as("nk")),
      Tables.supplier(s, d).select(col("s_nationkey").as("nk"))))

  private def qJoin5(s: SparkSession, d: String): DataFrame = {
    // TPC-H Q5 shape: 5-way join with two broadcast dims, revenue per nation.
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .withColumn("rev",
        dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
    Relational.sort(col("r_name"), col("n_name"))(
      asDouble("revenue")(Aggregates.groupAggregate(Seq("r_name", "n_name"), Seq(
        Agg(SUM, Some("rev"), "revenue"),
        Agg(COUNT, None, "n_items")))(j)))
  }

  // =========================================================================
  // Registry
  // =========================================================================

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_filter_project" -> (qFilterProject _),
    "q_limit_offset" -> (qLimitOffset _),
    "q_sort_topk" -> (qSortTopK _),
    "q_hash_join_inner" -> (qHashJoinInner _),
    "q_hash_join_left" -> (qHashJoinLeft _),
    "q_foreign_filter" -> (qForeignFilter _),
    "q_rowid_merge_join" -> (qRowidMergeJoin _),
    "q_coalesce" -> (qCoalesce _),
    "q_merge_union" -> (qMergeUnion _),
    "q_generate" -> (qGenerate _),
    "q_scalar_agg" -> (qScalarAgg _),
    "q_scalar_agg_empty" -> (qScalarAggEmpty _),
    "q_group_distinct" -> (qGroupDistinct _),
    "q_agg_concat" -> (qAggConcat _),
    "q_first_last" -> (qFirstLast _),
    "q_agg_limit" -> (qAggLimit _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _),
    "q_join5" -> (qJoin5 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_limit_offset" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 50 OFFSET 20""".stripMargin,
    "q_sort_topk" ->
      """SELECT p_partkey, p_type, p_retailprice FROM part
        |ORDER BY lower(p_type), p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
    "q_hash_join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_hash_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_foreign_filter" ->
      """WITH f AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS new_id
        |FROM orders WHERE o_totalprice > 150000.0)
        |SELECT f.new_id AS l_orderkey, l.l_linenumber, l.l_quantity
        |FROM lineitem l JOIN f ON l.l_orderkey = f.o_orderkey
        |ORDER BY 1, 2""".stripMargin,
    "q_rowid_merge_join" ->
      """WITH r AS (SELECT r_name, row_number() OVER (ORDER BY r_regionkey) - 1 AS rid FROM region)
        |SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM nation n JOIN r ON n.n_regionkey = r.rid ORDER BY n_nationkey""".stripMargin,
    "q_coalesce" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",
    "q_merge_union" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'A'
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_generate" ->
      "SELECT range AS seq, 42 AS c_int, 'x' AS c_str FROM range(10) ORDER BY seq",
    "q_scalar_agg" ->
      """SELECT COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |MIN(l_quantity) AS mn, MAX(l_quantity) AS mx FROM lineitem""".stripMargin,
    "q_scalar_agg_empty" ->
      """SELECT COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |MIN(l_quantity) AS mn FROM lineitem WHERE l_quantity < 0""".stripMargin,
    "q_group_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd_supp,
        |SUM(DISTINCT l_linenumber) AS sd_ln, COUNT(DISTINCT l_orderkey) AS nd_ord
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_concat" ->
      """SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_custkey) AS names, COUNT(*) AS cnt
        |FROM customer WHERE c_custkey <= 50
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_first_last" ->
      """SELECT l_returnflag,
        |min_by(l_quantity, l_orderkey * 10 + l_linenumber) AS first_qty,
        |max_by(l_quantity, l_orderkey * 10 + l_linenumber) AS last_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_limit" ->
      """WITH rk AS (SELECT l_suppkey AS k, dense_rank() OVER (ORDER BY l_suppkey) AS r
        |FROM (SELECT DISTINCT l_suppkey FROM lineitem)),
        |t AS (SELECT CASE WHEN rk.r <= 5 THEN l.l_suppkey END AS l_suppkey, l.l_quantity
        |FROM lineitem l JOIN rk ON l.l_suppkey = rk.k)
        |SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS cnt FROM t GROUP BY l_suppkey ORDER BY l_suppkey NULLS LAST""".stripMargin,
    "q_set_intersect" ->
      """SELECT nk FROM (SELECT c_nationkey AS nk FROM customer INTERSECT
        |SELECT s_nationkey AS nk FROM supplier) ORDER BY nk""".stripMargin,
    "q_set_except" ->
      """SELECT nk FROM (SELECT c_nationkey AS nk FROM customer EXCEPT
        |SELECT s_nationkey AS nk FROM supplier) ORDER BY nk""".stripMargin,
    "q_join5" ->
      """SELECT r_name, n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
  )
}
