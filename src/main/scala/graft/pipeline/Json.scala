package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column handling — the props/payload face every
  * event pipeline needs (beyond-reference surface: the reference is
  * strictly typed-columnar; JSON columns are the modern lakehouse
  * extension of its string expression family).
  *
  * Two extraction modes, both codegen-friendly and shuffle-free:
  *
  *  - [[extract]]/[[extractTyped]]: per-path `get_json_object` — JSONPath
  *    string extraction, right for one-off paths and deeply dynamic
  *    schemas; N paths re-parse the string N times.
  *  - [[parse]]/[[flatten]]: one `from_json` against a DDL schema — the
  *    document parses ONCE into a struct and every field is a plain
  *    column reference afterwards; right whenever several fields are
  *    read (the common case — use this in wide pipelines).
  *
  * At 100 TB the parse cost dominates scan cost for JSON-heavy tables;
  * flatten-once-then-project keeps it linear in documents, not in
  * documents × fields, and the resulting typed columns prune and push
  * down like any other.
  */
object Json {

  /** JSONPath extraction as string ('$.a.b', '$.arr[1]'); NULL on a
    * missing path or malformed document — never an error. */
  def extract(c: Column, path: String): Column = get_json_object(c, path)

  /** JSONPath extraction cast to a type (e.g. "long", "double"). */
  def extractTyped(c: Column, path: String, dataType: String): Column =
    get_json_object(c, path).cast(dataType)

  /** Parse once against a DDL schema ("k BIGINT, nest STRUCT<u: BIGINT>").
    * Malformed documents yield a NULL struct (PERMISSIVE), never an
    * error — the quarantine pattern for JSON is a `parse(...).isNull`
    * filter. */
  def parse(c: Column, ddl: String): Column =
    from_json(c, ddl, Map.empty[String, String])

  /** One parse, many columns: attach `fields` (fieldPath -> alias) from
    * `jsonCol` as typed top-level columns. fieldPath is dot notation into
    * the DDL schema ("nest.u"). */
  def flatten(df: DataFrame, jsonCol: String, ddl: String,
              fields: Seq[(String, String)]): DataFrame = {
    val parsed = df.withColumn("__j", parse(col(jsonCol), ddl))
    fields.foldLeft(parsed) { case (acc, (path, alias)) =>
      acc.withColumn(alias, path.split('.').foldLeft(col("__j"))(_ getField _))
    }.drop("__j")
  }
}
