package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-level parity for the reference's block file format
  * (cursor/infrastructure/file_io.cc). The golden fixture is assembled by
  * hand FROM THE FORMAT'S DOCUMENTED WRITE-PATH SEMANTICS (header comment
  * + WriteColumn/WriteVariableLengthData), so the reader is pinned to the
  * wire layout, not to this writer. */
class SupersonicFileSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"ssonic_$tag").toString
    sys.addShutdownHook {
      val dir = new java.io.File(d)
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
    d
  }

  // schema used by the golden fixture
  private val goldenSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("x", DoubleType, nullable = false),
    StructField("day", DateType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  test("golden fixture: hand-assembled bytes decode to the expected rows") {
    // chunk: row_count=3; columns in schema order.
    val buf = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(3L)                      // row_count
    // id: non-nullable INT64 -> raw 3x8
    buf.putLong(10L); buf.putLong(-5L); buf.putLong(Long.MaxValue)
    // s: nullable STRING -> 3 is_null bytes, 3 uint64 lengths (0 for null
    // AND empty), then concatenated non-null non-empty bytes
    buf.put(0.toByte); buf.put(1.toByte); buf.put(0.toByte) // row1 null
    val hello = "hello".getBytes("UTF-8")
    buf.putLong(hello.length.toLong); buf.putLong(0L); buf.putLong(0L) // row2 = "" (empty)
    buf.put(hello)
    // x: non-nullable DOUBLE -> raw 3x8
    buf.putDouble(1.5); buf.putDouble(-0.25); buf.putDouble(0.0)
    // day: nullable DATE (int32 days) -> 3 is_null bytes + 3x4 raw (null slot zeroed)
    buf.put(0.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.putInt(0); buf.putInt(19000); buf.putInt(0)
    // flag: nullable BOOL (1 byte) -> 3 is_null bytes + 3x1 raw
    buf.put(1.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.put(0.toByte); buf.put(1.toByte); buf.put(0.toByte)
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())

    val dir = tmpDir("golden")
    Files.write(Paths.get(dir, "part-00000.ssonic"), bytes)

    val got = SupersonicFile.read(spark, dir, goldenSchema)
      .orderBy("id").collect().toSeq.map(_.toSeq)
    assert(got == Seq(
      Seq(-5L, null, -0.25, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000)), true),
      Seq(10L, "hello", 1.5, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(0)), null),
      Seq(Long.MaxValue, "", 0.0, null, false)))
  }

  test("two chunks in one file concatenate (the FileSink append shape)") {
    val one = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    one.putLong(1L).putLong(7L)
    val two = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    two.putLong(2L).putLong(8L).putLong(9L)
    val dir = tmpDir("chunks")
    val all = java.util.Arrays.copyOf(one.array(), one.position()) ++
      java.util.Arrays.copyOf(two.array(), two.position())
    Files.write(Paths.get(dir, "part-00000.ssonic"), all)
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    assert(SupersonicFile.read(spark, dir, schema).orderBy("v")
      .collect().map(_.getLong(0)).toSeq == Seq(7L, 8L, 9L))
  }

  test("write -> read round-trips every carried type incl. nulls and empties") {
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("ts", TimestampNTZType, nullable = true)))
    val rows = (0 until 1000).map { k =>
      Row(
        if (k % 7 == 0) null else k - 500,
        k.toLong * 1000001L,
        if (k % 5 == 0) null else k / 3.0f,
        if (k % 11 == 0) null else math.sqrt(k.toDouble),
        if (k % 3 == 0) null else (k % 2 == 0),
        if (k % 4 == 0) null else if (k % 4 == 1) "" else s"str-$k-é",
        if (k % 6 == 0) null else Array.tabulate(k % 9)(j => (k + j).toByte),
        if (k % 8 == 0) null else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(k.toLong - 100)),
        if (k % 9 == 0) null
        else java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(k.toLong * 7919))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = tmpDir("roundtrip")
    SupersonicFile.write(df, dir, maxChunkRowCount = 128) // force multi-chunk
    val back = SupersonicFile.read(spark, dir, schema)
    val key: Seq[Any] => String = _.mkString("|")
    val a = df.collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).map(key).sorted
    val b = back.collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).map(key).sorted
    assert(a == b)
  }

  test("chunk row cap is enforced like the reference block capacity") {
    val buf = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(SupersonicFile.MaxChunkRowCount + 1L)
    val dir = tmpDir("badchunk")
    Files.write(Paths.get(dir, "part-00000.ssonic"),
      java.util.Arrays.copyOf(buf.array(), buf.position()))
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val e = intercept[Exception] {
      SupersonicFile.read(spark, dir, schema).collect()
    }
    assert(e.getMessage != null)
  }

  test("unsupported schema types are a clear bind error") {
    val e = intercept[IllegalArgumentException] {
      SupersonicFile.validateSchema(StructType(Seq(
        StructField("d", DecimalType(10, 2), nullable = true))))
    }
    assert(e.getMessage.contains("cannot carry"))
  }
}
