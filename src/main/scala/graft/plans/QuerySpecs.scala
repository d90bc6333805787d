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
  * Full expression trees are NOT re-serialized here by design: SQL text is
  * Spark's canonical cross-process query serialization (SURVEY §3.3), and
  * `spark.sql(...)` already ships arbitrary expressions. This module covers
  * the structured specs the reference serializes as protos.
  */
object QuerySpecs {

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
  def writeSortSpec(spec: SortSpec): String = Serialization.write(spec)
  def readSortSpec(json: String): SortSpec = Serialization.read[SortSpec](json)
  def writeSampleSpec(spec: SampleSpec): String = Serialization.write(spec)
  def readSampleSpec(json: String): SampleSpec = Serialization.read[SampleSpec](json)

  private val fnByName: Map[String, AggFn] = Map(
    "SUM" -> SUM, "MIN" -> MIN, "MAX" -> MAX, "COUNT" -> COUNT,
    "CONCAT" -> CONCAT, "FIRST" -> FIRST, "LAST" -> LAST)

  def sortKeyColumn(k: SortKeySpec): Column = {
    val base = if (k.caseInsensitive) Relational.caseInsensitive(col(k.column))
               else col(k.column)
    if (k.ascending) base.asc else base.desc
  }

  def toAgg(f: AggFieldSpec): Agg = Agg(
    fnByName.getOrElse(f.fn.toUpperCase,
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
