package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads modeled as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction /
  * frame-sampling plumbing.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are STUBS — deterministic fakes clearly marked below. The
  * Spark-side plumbing (schemas, binary slicing, mapPartitions batch shape,
  * partition-parallel execution) is real and tested; swapping the stub for
  * a real decoder is a one-function change.
  */
object Multimodal {

  /** Metadata schema attached to decoded media. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Wrap a column as an opaque binary payload (here: UTF-8 bytes; in a
    * real pipeline this column comes from the storage layer as-is). */
  def asBinary(df: DataFrame, payloadCol: String, out: String): DataFrame =
    df.withColumn(out, col(payloadCol).cast(BinaryType))

  def byteLength(df: DataFrame, binCol: String, out: String): DataFrame =
    df.withColumn(out, octet_length(col(binCol)).cast("long"))

  /** Frame sampling: slice the payload into `n` fixed-width frames
    * (binary substring — runs in codegen, no UDF). For video this is the
    * keyframe-stride pattern; stub keeps byte slices. */
  def frameSample(df: DataFrame, binCol: String, n: Int, frameBytes: Int,
                  out: String): DataFrame =
    df.withColumn(out, transform(sequence(lit(0), lit(n - 1)),
      i => substring(col(binCol), i * frameBytes + 1, lit(frameBytes))))

  /** STUB resize — nearest-neighbor byte sampling down to `dstLen` bytes:
    * out[i] = in[floor(i·srcLen/dstLen)]. A real implementation would be a
    * pixel-space resample inside the decode kernel; the plumbing shown here
    * (pure binary-slicing expressions, stays in codegen, no UDF) is what a
    * real one plugs into. Empty payloads stay empty. */
  def resizeStub(df: DataFrame, binCol: String, dstLen: Int, out: String): DataFrame = {
    val srcLen = octet_length(col(binCol))
    val sampled = concat((0 until dstLen).map { i =>
      substring(col(binCol), (floor(lit(i) * srcLen / dstLen) + 1).cast("int"), lit(1))
    }: _*)
    df.withColumn(out, when(srcLen === 0, col(binCol)).otherwise(sampled))
  }

  /** STUB image decode — a real implementation would call an image codec on
    * each binary payload inside mapPartitions (one codec instance per
    * partition, streaming batches). The fake derives deterministic
    * dimensions from the payload bytes so tests are stable.
    */
  def fakeDecode(bytes: Array[Byte]): (String, Int, Int) = {
    // STUB: pretend the first bytes are a header; a real decoder goes here.
    val w = if (bytes.isEmpty) 0 else ((bytes(0) & 0xff) % 64) + 1
    val h = if (bytes.length < 2) 0 else ((bytes(1) & 0xff) % 64) + 1
    ("fake/raw", w, h)
  }

  /** Decode a binary column into media metadata via mapPartitions — the
    * real plumbing a codec needs: per-partition setup, row-iterator batch
    * shape, explicit output schema. */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ MediaMetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec init would happen HERE (once, not per row)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val (fmt, w, h) = fakeDecode(bytes) // STUB decode
          Row.fromSeq(r.toSeq ++ Seq(fmt, w, h, bytes.length.toLong))
        }
      }
    }(enc)
  }

  /** Feature extraction stub: fixed-size feature vector per payload
    * (deterministic byte-histogram projection — a real extractor would run
    * a model here, batched per partition). */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int, out: String): DataFrame = {
    df.withColumn(out, transform(sequence(lit(0), lit(dim - 1)), i =>
      // STUB feature: byte at stride position, normalized to [0,1)
      (ascii(substring(col(binCol).cast("string"), i + 1, lit(1))) % 256).cast("double") / 256.0))
  }
}
