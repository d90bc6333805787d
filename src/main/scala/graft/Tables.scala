package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic parquet tables
  * (see TESTDATA.md). All engine queries take the scale-factor
  * directory as a parameter so the same plan runs at any SF.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Driver parquet vintages differ in how they store timestamps: some
    * rounds write TIMESTAMP(NANOS) (read as Long under
    * spark.sql.legacy.parquet.nanosAsLong), newer ones TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) which Spark 4 infers as TIMESTAMP_NTZ. The
    * engine's gates are written against plain TIMESTAMP (strict-input
    * functions like unix_micros reject NTZ), so normalize here: with the
    * session zone pinned to UTC the NTZ→TZ cast is value-preserving and
    * DuckDB sees the identical naive instant either way. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    import org.apache.spark.sql.functions.col
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast("timestamp"))
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS): read as nanos-long (session sets
    * spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
    * timestamp here, matching engines that truncate ns to us. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
