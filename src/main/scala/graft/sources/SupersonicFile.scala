package graft.sources

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's binary block-file format — FileOutput / FileInput
  * (`cursor/infrastructure/file_io.cc`, format documented at its header
  * comment lines 15-29). This is the last exact-bytes interop face after
  * round 9's ProtoWire: a deployment that spilled views with the
  * reference's FileSink can ingest those bytes here, and vice versa.
  *
  * Layout (all integers little-endian, x86 write path):
  *   file  := chunk*                       (until EOF)
  *   chunk := uint64 row_count (1..8192)   (kMaxChunkRowCount, file_io.cc:72)
  *            column*                      (schema order)
  *   column (nullable)        := row_count bytes of bool is_null (1 = null)
  *                               — the open-source build sets
  *                               USE_BITS_FOR_IS_NULL_REPRESENTATION false
  *                               (bit_pointers.h:62), so nullability is one
  *                               BYTE per row, not a bitmap
  *   column (variable length) := row_count x uint64 byte-lengths
  *                               (0 for null AND for empty strings), then
  *                               the concatenated bytes of every non-null,
  *                               non-empty value (file_io.cc:122-148)
  *   column (fixed length)    := row_count x type-size raw values
  *                               (file_io.cc:167-170; null slots are
  *                               unspecified on the wire — this writer
  *                               zeroes them for determinism)
  *
  * Schema is NOT in the file — the reader takes it as an argument, exactly
  * like the reference's FileInput(schema, file) (file_io.h:75). Type map
  * (base/infrastructure/types.h): INT32/UINT32→int 4, INT64/UINT64→long 8,
  * FLOAT 4, DOUBLE 8, BOOL 1 byte, DATE→int32 days, DATETIME→int64 micros
  * (carried as TimestampNTZ per the repo's civil-time model), STRING/BINARY
  * variable-length.
  *
  * Scale shape: the writer emits ONE independent file per partition (each a
  * valid chunk stream — the format concatenates), the reader maps one task
  * per file; no shuffle either way, no driver data path. The reference's
  * own header calls the format temporary-storage-only — this face exists
  * for interop, not as the preferred store (use parquet). */
object SupersonicFile {

  /** kMaxChunkRowCount (file_io.cc:72). */
  val MaxChunkRowCount: Int = 8192

  private def fixedByteSize(dt: DataType): Int = dt match {
    case BooleanType => 1
    case IntegerType | DateType | FloatType => 4
    case LongType | TimestampNTZType | DoubleType => 8
    case other => throw new IllegalArgumentException(s"not fixed-width: $other")
  }

  /** Types the reference format can carry; anything else is a clear error
    * (the reference has no nested/decimal types at all). */
  def validateSchema(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampNTZType | StringType | BinaryType => ()
      case other => throw new IllegalArgumentException(
        s"supersonic file format cannot carry column '${f.name}' of type " +
          s"${other.sql} (reference types.h has no such DataType)")
    }
  }

  // ===== little-endian primitives =====

  private def writeLongLE(out: OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
  private def writeIntLE(out: OutputStream, v: Int): Unit = {
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
  }

  private def readFully(in: DataInputStream, buf: Array[Byte]): Unit =
    in.readFully(buf)
  private def longLE(buf: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (buf(off + i) & 0xFFL); i -= 1 }
    v
  }
  private def intLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xFF) | ((buf(off + 1) & 0xFF) << 8) |
      ((buf(off + 2) & 0xFF) << 16) | ((buf(off + 3) & 0xFF) << 24)

  // ===== write =====

  /** Encode one chunk (<= MaxChunkRowCount rows) onto `out`. */
  private def writeChunk(out: OutputStream, schema: StructType,
                         rows: Array[InternalRow]): Unit = {
    val n = rows.length
    writeLongLE(out, n.toLong)
    var c = 0
    while (c < schema.length) {
      val field = schema(c)
      if (field.nullable) {
        var r = 0
        while (r < n) { out.write(if (rows(r).isNullAt(c)) 1 else 0); r += 1 }
      }
      field.dataType match {
        case StringType | BinaryType =>
          val datas = new Array[Array[Byte]](n)
          var r = 0
          while (r < n) {
            datas(r) =
              if (rows(r).isNullAt(c)) null
              else field.dataType match {
                case StringType => rows(r).getUTF8String(c).getBytes
                case _ => rows(r).getBinary(c)
              }
            writeLongLE(out, if (datas(r) == null) 0L else datas(r).length.toLong)
            r += 1
          }
          r = 0
          while (r < n) {
            if (datas(r) != null && datas(r).length > 0) out.write(datas(r))
            r += 1
          }
        case dt =>
          val size = fixedByteSize(dt)
          var r = 0
          while (r < n) {
            val row = rows(r)
            if (row.isNullAt(c)) {
              var i = 0
              while (i < size) { out.write(0); i += 1 }
            } else dt match {
              case BooleanType => out.write(if (row.getBoolean(c)) 1 else 0)
              case IntegerType | DateType => writeIntLE(out, row.getInt(c))
              case FloatType => writeIntLE(out, java.lang.Float.floatToRawIntBits(row.getFloat(c)))
              case LongType | TimestampNTZType => writeLongLE(out, row.getLong(c))
              case DoubleType => writeLongLE(out, java.lang.Double.doubleToRawLongBits(row.getDouble(c)))
              case other => throw new IllegalStateException(s"unreachable: $other")
            }
            r += 1
          }
      }
      c += 1
    }
  }

  /** One partition's write — attempt-safe for BOTH task retries and
    * speculative duplicates: bytes go to a dot-temp file named by the task
    * ATTEMPT, then rename onto the final part name. Every attempt of a
    * partition produces identical bytes (the chunk stream is a pure
    * function of the input iterator), so whichever attempt's rename wins
    * is equivalent; a loser (rename refused because the winner's file
    * exists, e.g. on HDFS) just discards its temp. A direct create() of
    * the final path would let two live attempts interleave writes.
    * Returns the row count (0 = nothing written: the reference rejects
    * 0-row chunks, and an absent file and an empty file read the same). */
  private[sources] def writePartitionFile(
      hconf: org.apache.hadoop.conf.Configuration, dir: String, pid: Int,
      attemptUid: String, schema: StructType, rows: Iterator[InternalRow],
      maxChunkRowCount: Int): Long = {
    var written = 0L
    var out: OutputStream = null
    val fs = new Path(dir).getFileSystem(hconf)
    val tmpPath = new Path(dir, f".part-$pid%05d-$attemptUid.ssonic.tmp")
    val buf = new Array[InternalRow](maxChunkRowCount)
    var k = 0
    def flush(): Unit = if (k > 0) {
      if (out == null) out = fs.create(tmpPath, true)
      writeChunk(out, schema, java.util.Arrays.copyOf(buf, k))
      written += k
      k = 0
    }
    while (rows.hasNext) {
      buf(k) = rows.next().copy() // toRdd rows are reused by the iterator
      k += 1
      if (k == maxChunkRowCount) flush()
    }
    flush()
    if (out != null) {
      out.close()
      val finalPath = new Path(dir, f"part-$pid%05d.ssonic")
      if (!fs.rename(tmpPath, finalPath)) {
        // another attempt already committed an identical file
        fs.delete(tmpPath, false)
      }
    }
    written
  }

  /** Write `df` as a directory of supersonic block files, one per
    * partition (skipping empty partitions). */
  def write(df: DataFrame, dir: String,
            maxChunkRowCount: Int = MaxChunkRowCount): Unit = {
    require(maxChunkRowCount > 0 && maxChunkRowCount <= MaxChunkRowCount,
      s"maxChunkRowCount must be in 1..$MaxChunkRowCount (reader block capacity)")
    val schema = df.schema
    validateSchema(schema)
    val conf = new org.apache.spark.SerializableWritable(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // bounded driver traffic: one (partition, rowcount) pair per task
    val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val tc = org.apache.spark.TaskContext.get()
      val uid = if (tc == null) "local" else s"${tc.stageId}-${tc.taskAttemptId}"
      Iterator.single(
        pid -> writePartitionFile(conf.value, dir, pid, uid, schema, it, maxChunkRowCount))
    }.collect()
    require(counts.nonEmpty || df.isEmpty, "write produced no partitions")
  }

  // ===== read =====

  /** Decode one file's chunk stream into rows. */
  private def decodeStream(in0: InputStream, schema: StructType): Iterator[InternalRow] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(in0, 1 << 16))
    val eight = new Array[Byte](8)

    def readChunk(): Option[Array[InternalRow]] = {
      // EOF exactly at a chunk boundary ends the stream (file_io.cc:267)
      val first = in.read()
      if (first < 0) { in.close(); return None }
      eight(0) = first.toByte
      in.readFully(eight, 1, 7)
      val n0 = longLE(eight, 0)
      if (n0 <= 0 || n0 > MaxChunkRowCount)
        throw new java.io.IOException(
          s"supersonic file: bad chunk row count $n0 (must be 1..$MaxChunkRowCount)")
      val n = n0.toInt
      val vals = Array.fill(n)(new Array[Any](schema.length))
      var c = 0
      while (c < schema.length) {
        val field = schema(c)
        val nulls = new Array[Boolean](n)
        if (field.nullable) {
          val nb = new Array[Byte](n)
          readFully(in, nb)
          var r = 0
          while (r < n) { nulls(r) = nb(r) != 0; r += 1 }
        }
        field.dataType match {
          case StringType | BinaryType =>
            val lens = new Array[Byte](8 * n)
            readFully(in, lens)
            var r = 0
            while (r < n) {
              val len = longLE(lens, 8 * r)
              if (len < 0 || len > Int.MaxValue)
                throw new java.io.IOException(s"supersonic file: bad string length $len")
              r += 1
            }
            r = 0
            while (r < n) {
              if (!nulls(r)) {
                val len = longLE(lens, 8 * r).toInt
                val data = new Array[Byte](len)
                if (len > 0) readFully(in, data)
                vals(r)(c) =
                  if (field.dataType == StringType) UTF8String.fromBytes(data) else data
              }
              r += 1
            }
          case dt =>
            val size = fixedByteSize(dt)
            val raw = new Array[Byte](size * n)
            readFully(in, raw)
            var r = 0
            while (r < n) {
              if (!nulls(r)) vals(r)(c) = dt match {
                case BooleanType => raw(r) != 0
                case IntegerType | DateType => intLE(raw, 4 * r)
                case FloatType => java.lang.Float.intBitsToFloat(intLE(raw, 4 * r))
                case LongType | TimestampNTZType => longLE(raw, 8 * r)
                case DoubleType => java.lang.Double.longBitsToDouble(longLE(raw, 8 * r))
                case other => throw new IllegalStateException(s"unreachable: $other")
              }
              r += 1
            }
        }
        c += 1
      }
      Some(vals.map(v => new GenericInternalRow(v): InternalRow))
    }

    Iterator.continually(readChunk()).takeWhile(_.isDefined).flatMap(_.get)
  }

  /** Read a supersonic block file (or a directory of them) with the given
    * schema — the format itself carries none (file_io.h:75). One task per
    * file; varlen corruption fails loudly, exactly like the reference's
    * premature-EOF checks. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    validateSchema(schema)
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) => decodeStream(stream.open(), schema) }
    ColumnBridge.fromInternalRows(spark, rdd, schema)
  }
}
