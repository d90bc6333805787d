package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.operators.{Aggregates, Relational}
import graft.operators.Aggregates._

/** Serialized query specifications — §3.3 parity with the reference, which
  * ships proto-serialized expression / sort / aggregation specs across
  * process boundaries (reference:
  * serialization/build_expression_from_proto.h:31-33,
  * cursor/core/specification_builder.h). The Spark-native wire format is
  * JSON: the declarative subset of the DSL (aggregation specs with
  * group-by keys, sort specs with case-insensitive keys and top-k limit)
  * round-trips losslessly, and the `build*` functions reconstitute
  * runnable operators on the receiving side.
  *
  * FULL expression trees are NOT re-serialized here by design: SQL text is
  * Spark's canonical cross-process query serialization (SURVEY §3.3), and
  * `spark.sql(...)` already ships arbitrary expressions. This module covers
  * the structured specs the reference serializes as protos, plus the
  * [[ExprSpec]] subset (column refs, typed literals, comparisons, boolean
  * connectives, IS NULL, full arithmetic incl. div/mod, string
  * concat/substr/case-folding, CASE, IN) matching the operator families
  * build_expression_from_proto.h reconstitutes — enough for serialized
  * Filter/Project stages without re-inventing a SQL parser.
  */
object QuerySpecs {

  /** One expression-tree node, JSON-encoded as a single recursive record:
    * `op` selects the node kind; `column` (op=col), `value`+`valueType`
    * (op=lit — the literal is carried as its string form and CAST to the
    * DDL type on rebuild, so the wire format has no engine-specific value
    * encoding), `children` (everything else). Ops: col, lit, eq, neq, lt,
    * le, gt, ge, and, or, not, isnull, add, sub, mul, div, mod, concat
    * (variadic), substr (str, pos, len — SQL 1-based), lower, upper, in
    * (needle then values, SQL 3-valued semantics), case (alternating
    * when/then children, optional trailing else — no else yields NULL,
    * as in SQL) — the operator families of the reference's expression
    * proto enum (supersonic/expression/proto/operators.proto:17-182)
    * that serialized Filter/Project stages actually use. */
  final case class ExprSpec(op: String,
                            column: Option[String] = None,
                            value: Option[String] = None,
                            valueType: Option[String] = None,
                            children: List[ExprSpec] = Nil)

  /** Filter stage: keep rows where the predicate is true (reference
    * cursor/core/filter.h — predicate shipped as an expression proto). */
  final case class FilterSpec(predicate: ExprSpec)

  /** One projected column: expression + optional output name. */
  final case class ProjectField(expr: ExprSpec, as: Option[String] = None)

  /** Projection stage (reference cursor/core/project.h): the output has
    * EXACTLY these columns, in order. */
  final case class ProjectSpec(columns: List[ProjectField])

  object ExprSpec {
    def colRef(name: String): ExprSpec = ExprSpec("col", column = Some(name))
    def literal(value: String, ddlType: String): ExprSpec =
      ExprSpec("lit", value = Some(value), valueType = Some(ddlType))
    private def node(op: String, cs: ExprSpec*): ExprSpec =
      ExprSpec(op, children = cs.toList)
    def eq(a: ExprSpec, b: ExprSpec): ExprSpec = node("eq", a, b)
    def neq(a: ExprSpec, b: ExprSpec): ExprSpec = node("neq", a, b)
    def lt(a: ExprSpec, b: ExprSpec): ExprSpec = node("lt", a, b)
    def le(a: ExprSpec, b: ExprSpec): ExprSpec = node("le", a, b)
    def gt(a: ExprSpec, b: ExprSpec): ExprSpec = node("gt", a, b)
    def ge(a: ExprSpec, b: ExprSpec): ExprSpec = node("ge", a, b)
    def and(a: ExprSpec, b: ExprSpec): ExprSpec = node("and", a, b)
    def or(a: ExprSpec, b: ExprSpec): ExprSpec = node("or", a, b)
    def not(a: ExprSpec): ExprSpec = node("not", a)
    def isNull(a: ExprSpec): ExprSpec = node("isnull", a)
    def add(a: ExprSpec, b: ExprSpec): ExprSpec = node("add", a, b)
    def sub(a: ExprSpec, b: ExprSpec): ExprSpec = node("sub", a, b)
    def mul(a: ExprSpec, b: ExprSpec): ExprSpec = node("mul", a, b)
    def div(a: ExprSpec, b: ExprSpec): ExprSpec = node("div", a, b)
    def mod(a: ExprSpec, b: ExprSpec): ExprSpec = node("mod", a, b)
    def concat(cs: ExprSpec*): ExprSpec = node("concat", cs: _*)
    def substr(str: ExprSpec, pos: ExprSpec, len: ExprSpec): ExprSpec =
      node("substr", str, pos, len)
    def lower(a: ExprSpec): ExprSpec = node("lower", a)
    def upper(a: ExprSpec): ExprSpec = node("upper", a)
    def in(needle: ExprSpec, values: ExprSpec*): ExprSpec =
      node("in", needle +: values: _*)
    def fingerprint(a: ExprSpec): ExprSpec = node("fingerprint", a)
    def hash(a: ExprSpec, seed: ExprSpec): ExprSpec = node("hash", a, seed)
    /** CASE WHEN b1 THEN v1 [WHEN b2 THEN v2 ...] [ELSE e] END. */
    def caseWhen(branches: Seq[(ExprSpec, ExprSpec)],
                 otherwise: Option[ExprSpec] = None): ExprSpec =
      node("case",
        branches.flatMap { case (c, v) => Seq(c, v) } ++ otherwise.toSeq: _*)
  }

  /** Reconstitute an [[ExprSpec]] tree as a Catalyst Column. */
  def toColumn(e: ExprSpec): Column = {
    def child(i: Int): Column = toColumn(e.children(i))
    def binary(f: (Column, Column) => Column): Column = {
      require(e.children.size == 2, s"'${e.op}' expects 2 children")
      f(child(0), child(1))
    }
    e.op match {
      case "col" => col(e.column.getOrElse(
        throw new IllegalArgumentException("col node needs 'column'")))
      case "lit" =>
        val t = DataType.fromDDL(e.valueType.getOrElse("STRING"))
        lit(e.value.orNull).cast(t)
      case "eq" => binary(_ === _)
      case "neq" => binary(_ =!= _)
      case "lt" => binary(_ < _)
      case "le" => binary(_ <= _)
      case "gt" => binary(_ > _)
      case "ge" => binary(_ >= _)
      case "and" => binary(_ && _)
      case "or" => binary(_ || _)
      case "not" =>
        require(e.children.size == 1, "'not' expects 1 child"); !child(0)
      case "isnull" =>
        require(e.children.size == 1, "'isnull' expects 1 child"); child(0).isNull
      case "add" => binary(_ + _)
      case "sub" => binary(_ - _)
      case "mul" => binary(_ * _)
      case "div" => binary(_ / _)
      case "mod" => binary(_ % _)
      case "concat" =>
        require(e.children.nonEmpty, "'concat' expects at least 1 child")
        concat(e.children.map(toColumn): _*)
      case "substr" =>
        require(e.children.size == 3, "'substr' expects 3 children (str, pos, len)")
        child(0).substr(child(1), child(2))
      case "lower" =>
        require(e.children.size == 1, "'lower' expects 1 child"); lower(child(0))
      case "upper" =>
        require(e.children.size == 1, "'upper' expects 1 child"); upper(child(0))
      case "in" =>
        require(e.children.size >= 2, "'in' expects a needle plus values")
        child(0).isin(e.children.tail.map(toColumn): _*)
      case "fingerprint" =>
        require(e.children.size == 1, "'fingerprint' expects 1 child")
        graft.functions.Exprs.fingerprint(child(0))
      case "hash" =>
        require(e.children.size == 2, "'hash' expects 2 children (value, seed)")
        graft.functions.Exprs.hashE(child(0), child(1))
      case "case" =>
        require(e.children.size >= 2, "'case' expects at least one (when, then) pair")
        val cs = e.children.map(toColumn)
        val nPairs = e.children.size / 2
        val w = (1 until nPairs).foldLeft(when(cs(0), cs(1))) { (acc, i) =>
          acc.when(cs(2 * i), cs(2 * i + 1))
        }
        if (e.children.size % 2 == 1) w.otherwise(cs.last) else w
      case other => throw new IllegalArgumentException(s"unknown expr op '$other'")
    }
  }

  /** One sort key (reference: proto/specification.proto SortSpecification —
    * column, direction, case sensitivity). */
  final case class SortKeySpec(column: String, ascending: Boolean = true,
                               caseInsensitive: Boolean = false)

  /** ExtendedSort specification: keys + optional top-k limit. */
  final case class SortSpec(keys: List[SortKeySpec], limit: Option[Int] = None)

  /** One aggregation, mirroring Aggregates.Agg with JSON-safe fields;
    * outType is a Spark DDL type string (e.g. "BIGINT"). */
  final case class AggFieldSpec(fn: String, input: Option[String], output: String,
                                distinct: Boolean = false,
                                outType: Option[String] = None,
                                orderBy: Option[SortKeySpec] = None,
                                sep: String = ",")

  /** AggregationSpecification + grouping keys (reference: aggregate.h:47-158;
    * empty groupBy = ScalarAggregate). */
  final case class AggSpec(groupBy: List[String], aggs: List[AggFieldSpec])

  /** One split label + fraction (ordered — range layout follows list
    * order, see Sampling.assignSplit). */
  final case class SplitFraction(label: String, fraction: Double)

  /** Deterministic-sampling specification (beyond-reference surface):
    * `kind` = "bernoulli" (rate), "stratified" (strataCol + rates +
    * defaultRate), or "split" (splits). Hash keys in `keyCols`. */
  final case class SampleSpec(kind: String, keyCols: List[String],
                              rate: Option[Double] = None,
                              strataCol: Option[String] = None,
                              rates: Option[Map[String, Double]] = None,
                              defaultRate: Option[Double] = None,
                              splits: Option[List[SplitFraction]] = None)

  implicit private val formats: Formats = DefaultFormats

  def writeAggSpec(spec: AggSpec): String = Serialization.write(spec)
  def readAggSpec(json: String): AggSpec = Serialization.read[AggSpec](json)
  def writeFilterSpec(spec: FilterSpec): String = Serialization.write(spec)
  def readFilterSpec(json: String): FilterSpec = Serialization.read[FilterSpec](json)
  def writeProjectSpec(spec: ProjectSpec): String = Serialization.write(spec)
  def readProjectSpec(json: String): ProjectSpec = Serialization.read[ProjectSpec](json)
  def writeSortSpec(spec: SortSpec): String = Serialization.write(spec)
  def readSortSpec(json: String): SortSpec = Serialization.read[SortSpec](json)
  def writeSampleSpec(spec: SampleSpec): String = Serialization.write(spec)
  def readSampleSpec(json: String): SampleSpec = Serialization.read[SampleSpec](json)

  private val fnByName: Map[String, AggFn] = Map(
    "SUM" -> SUM, "MIN" -> MIN, "MAX" -> MAX, "COUNT" -> COUNT,
    "CONCAT" -> CONCAT, "FIRST" -> FIRST, "LAST" -> LAST,
    "ARG_MAX" -> ARG_MAX, "ARG_MIN" -> ARG_MIN)

  def sortKeyColumn(k: SortKeySpec): Column = {
    val base = if (k.caseInsensitive) Relational.caseInsensitive(col(k.column))
               else col(k.column)
    if (k.ascending) base.asc else base.desc
  }

  def toAgg(f: AggFieldSpec): Agg = Agg(
    fnByName.getOrElse(f.fn.toUpperCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(s"unknown aggregate fn '${f.fn}'")),
    f.input, f.output, f.distinct,
    f.outType.map(DataType.fromDDL),
    // an aggregation order key is a plain VALUE column (the DSL sorts the
    // aggregation buffer ascending on it — see Aggregates CONCAT/FIRST/
    // LAST); only case folding applies, and descending is rejected because
    // the in-process DSL cannot express it either
    f.orderBy.map { k =>
      require(k.ascending, "aggregation order keys sort ascending")
      if (k.caseInsensitive) Relational.caseInsensitive(col(k.column))
      else col(k.column)
    }, f.sep)

  /** Reconstitute + run an aggregation spec (GroupAggregate, or
    * ScalarAggregate when groupBy is empty). */
  def buildAggregate(spec: AggSpec)(df: DataFrame): DataFrame =
    if (spec.groupBy.isEmpty) Aggregates.scalarAggregate(spec.aggs.map(toAgg))(df)
    else Aggregates.groupAggregate(spec.groupBy, spec.aggs.map(toAgg))(df)

  /** Reconstitute + run a filter spec (predicate-true rows kept, standard
    * SQL three-valued semantics — NULL predicate drops the row). */
  def buildFilter(spec: FilterSpec)(df: DataFrame): DataFrame =
    Relational.filter(toColumn(spec.predicate))(df)

  /** Reconstitute + run a projection spec (exact output columns, in
    * order; unnamed computed fields keep Spark's derived name). */
  def buildProject(spec: ProjectSpec)(df: DataFrame): DataFrame =
    df.select(spec.columns.map { f =>
      val c = toColumn(f.expr)
      f.as.fold(c)(c.as)
    }: _*)

  /** Reconstitute + run a sort spec (ExtendedSort: case-insensitive keys,
    * optional distributed top-k). */
  def buildSort(spec: SortSpec)(df: DataFrame): DataFrame =
    Relational.extendedSort(spec.keys.map(sortKeyColumn), spec.limit)(df)

  /** Reconstitute + run a sampling spec. */
  def buildSample(spec: SampleSpec)(df: DataFrame): DataFrame = {
    import graft.pipeline.Sampling
    spec.kind match {
      case "bernoulli" =>
        Sampling.bernoulli(df, spec.keyCols, spec.rate.getOrElse(
          throw new IllegalArgumentException("bernoulli spec needs rate")))
      case "stratified" =>
        Sampling.stratified(df,
          spec.strataCol.getOrElse(throw new IllegalArgumentException(
            "stratified spec needs strataCol")),
          spec.rates.getOrElse(Map.empty),
          spec.defaultRate.getOrElse(throw new IllegalArgumentException(
            "stratified spec needs defaultRate")),
          spec.keyCols)
      case "split" =>
        Sampling.assignSplit(df, spec.keyCols,
          spec.splits.getOrElse(throw new IllegalArgumentException(
            "split spec needs splits")).map(s => s.label -> s.fraction))
      case other =>
        throw new IllegalArgumentException(s"unknown sample kind '$other'")
    }
  }
}
