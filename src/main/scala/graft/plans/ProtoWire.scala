package graft.plans

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Exprs

/** Binary expression-tree serialization with EXACT wire parity to the
  * reference's protobuf format (reference:
  * serialization/build_expression_from_proto.h:31-33 reconstitutes
  * `common.ExpressionDescription` messages defined in
  * utils/proto/expressions.proto:292-303 over the `common.DataType` enum of
  * utils/proto/types.proto:9-29). A byte stream produced by any standard
  * protobuf serializer for those messages decodes here, and bytes encoded
  * here parse with any protobuf library — the codec below implements the
  * public proto2 wire format (varint / fixed32 / fixed64 / length-delimited,
  * last-one-wins scalars, unknown-field skipping) by hand, so the engine
  * ships zero new dependencies.
  *
  * Layering:
  *   - [[ProtoWire.Writer]] / [[ProtoWire.Reader]] — the wire primitives;
  *   - the `P*` case classes — a 1:1 model of the reference messages
  *     (field numbers in scaladoc match expressions.proto);
  *   - `encode* / decode*` — message codecs;
  *   - [[ProtoWire.toColumn]] / [[ProtoWire.toColumns]] — rebuild Catalyst
  *     columns, mirroring BuildExpressionFromProto's dispatch
  *     (build_expression_from_proto.cc:519-729) onto [[graft.functions.Exprs]];
  *   - [[ProtoWire.fromExprSpec]] — bridge from the JSON DSL
  *     ([[QuerySpecs.ExprSpec]]) so the same spec can ship on either wire.
  *
  * Semantics notes (deltas documented in SURVEY §3.3 / §7): WEEKDAY is
  * Monday=0 per the proto comment (expressions.proto:200) — Spark's
  * `weekday` agrees; `*_LOCAL` extractors coincide with UTC because the
  * session timezone is UTC; DATE_FORMAT patterns use Spark's dialect;
  * operators the reference leaves NOT_IMPLEMENTED (COPY, DATEDIFF,
  * DATETIMEDIFF, ADD_WEEK, ADD_YEAR, TRUNC_TO_*) are implemented here as
  * the natural Spark equivalents (superset).
  */
object ProtoWire {

  // ===== proto2 wire primitives =====

  private[plans] final class Writer {
    private val out = new ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)
    /** int32/int64/uint32/uint64/bool/enum — negative int32 sign-extends to
      * 64 bits (10-byte varint), as proto2 requires. */
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); writeVarint(v) }
    def boolField(field: Int, v: Boolean): Unit = varintField(field, if (v) 1L else 0L)
    def floatField(field: Int, v: Float): Unit = {
      tag(field, 5)
      val bits = java.lang.Float.floatToIntBits(v)
      var i = 0
      while (i < 4) { out.write((bits >>> (8 * i)) & 0xff); i += 1 }
    }
    def doubleField(field: Int, v: Double): Unit = {
      tag(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytesField(field: Int, v: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(v.length.toLong); out.write(v, 0, v.length)
    }
    def stringField(field: Int, v: String): Unit =
      bytesField(field, v.getBytes(StandardCharsets.UTF_8))
    def messageField(field: Int, body: Writer => Unit): Unit = {
      val w = new Writer; body(w); bytesField(field, w.bytes)
    }
  }

  private[plans] final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        require(pos < end, "proto wire: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("proto wire: varint over 10 bytes")
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      require(field > 0, s"proto wire: invalid field number $field")
      (field, wire)
    }
    def readFixed32(): Int = {
      require(end - pos >= 4, "proto wire: truncated fixed32")
      var bits = 0; var i = 0
      while (i < 4) { bits |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; bits
    }
    def readFixed64(): Long = {
      require(end - pos >= 8, "proto wire: truncated fixed64")
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; bits
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      require(len >= 0 && end - pos >= len, "proto wire: truncated length-delimited field")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; r
    }
    def readString(): String = new String(readBytes(), StandardCharsets.UTF_8)
    def subReader(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && end - pos >= len, "proto wire: truncated embedded message")
      val r = new Reader(buf, pos, pos + len); pos += len; r
    }
    /** Skip an unknown field (forward compatibility, like protobuf). */
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => readFixed64(); ()
      case 2 => readBytes(); ()
      case 5 => readFixed32(); ()
      case w => throw new IllegalArgumentException(s"proto wire: unsupported wire type $w")
    }
  }

  // ===== common.DataType (types.proto:9-29) =====

  object PType {
    val STRING = 0; val INT32 = 1; val INT64 = 2; val UINT64 = 3
    val DATETIME = 4; val DOUBLE = 5; val BOOL = 6; val BINARY = 7
    val UINT32 = 8; val FLOAT = 9; val DATE = 10; val DATA_TYPE = 11
    val NULL_TYPE = 12; val ENUM = 13

    /** ResolveType (build_expression_from_proto.cc:75-85): tags 0..11 are
      * supported; NULL_TYPE and ENUM are rejected exactly like the
      * reference. UINT32 widens to LONG and UINT64 to DECIMAL(20,0) so the
      * full unsigned ranges are representable. */
    def toSpark(tag: Int): DataType = tag match {
      case STRING => StringType
      case INT32 => IntegerType
      case INT64 => LongType
      case UINT64 => DecimalType(20, 0)
      // NTZ, matching GraftTypes and constantToColumn's civil decode —
      // proto-driven CAST/PARSE_STRING must not read the session zone
      case DATETIME => TimestampNTZType
      case DOUBLE => DoubleType
      case BOOL => BooleanType
      case BINARY => BinaryType
      case UINT32 => LongType
      case FLOAT => FloatType
      case DATE => DateType
      case DATA_TYPE => throw new IllegalArgumentException(
        "DATA_TYPE is only valid as the first argument of CAST / PARSE_STRING")
      case t => throw new IllegalArgumentException(s"Type tag $t not supported")
    }
  }

  // ===== messages (expressions.proto) =====

  /** common.Constant (expressions.proto:22-39; field numbers as declared).
    * Exactly one value field should be set; none set = typed NULL, matching
    * CreateConstExpression (build_expression_from_proto.cc:144-150). */
  final case class PConstant(
      typeTag: Int,                                   // 1 (required DataType)
      int32Value: Option[Int] = None,                 // 2
      int64Value: Option[Long] = None,                // 3
      uint32Value: Option[Long] = None,               // 4 (0..2^32-1)
      uint64Value: Option[BigInt] = None,             // 5 (0..2^64-1)
      floatValue: Option[Float] = None,               // 6
      doubleValue: Option[Double] = None,             // 7
      boolValue: Option[Boolean] = None,              // 8
      dateValue: Option[Int] = None,                  // 9 (days since epoch)
      datetimeValue: Option[Long] = None,             // 10 (micros since epoch)
      binaryValue: Option[Seq[Byte]] = None,          // 11
      stringValue: Option[String] = None,             // 12
      dataTypeValue: Option[Int] = None)              // 13 (DataType enum)

  /** common.Variable (expressions.proto:259-261). */
  final case class PVariable(name: String)            // 1 (required)

  /** common.OperationDescription (expressions.proto:264-267). */
  final case class POperation(opType: Int,            // 1 (required OperationType)
                              args: List[PExpression] = Nil) // 2 (repeated)

  /** common.CustomFunctionCall (expressions.proto:254-257). */
  final case class PFunctionCall(functionName: String, // 1 (required)
                                 args: List[PExpression] = Nil) // 2 (repeated)

  /** common.Tuple.TupleExpression (expressions.proto:274-279). */
  final case class PTupleExpression(expr: PExpression, // 1 (required)
                                    aliases: List[String] = Nil) // 2 (repeated)

  /** common.Tuple (expressions.proto:273-281). */
  final case class PTuple(exprs: List[PTupleExpression]) // 1 (repeated)

  /** common.Path (expressions.proto:288-290). */
  final case class PPath(nodes: List[String])          // 1 (repeated)

  /** common.ExpressionDescription (expressions.proto:292-303). The `kind`
    * tag mirrors ExpressionType (expressions.proto:13-20); exactly one
    * payload field is set, at the field number the proto declares. */
  final case class PExpression(
      kind: Int,                                      // 1 (required ExpressionType)
      constant: Option[PConstant] = None,             // 2
      variable: Option[PVariable] = None,             // 3
      operation: Option[POperation] = None,           // 4
      functionCall: Option[PFunctionCall] = None,     // 5
      tuple: Option[PTuple] = None,                   // 6
      path: Option[PPath] = None)                     // 7

  /** ExpressionType tags (expressions.proto:13-20). */
  object PKind {
    val CONSTANT = 0; val VARIABLE = 1; val OPERATION = 2
    val CUSTOM_FUNCTION_CALL = 3; val TUPLE = 4; val PATH = 5
  }

  object PExpression {
    def constant(c: PConstant): PExpression = PExpression(PKind.CONSTANT, constant = Some(c))
    def variable(name: String): PExpression =
      PExpression(PKind.VARIABLE, variable = Some(PVariable(name)))
    def operation(opType: Int, args: PExpression*): PExpression =
      PExpression(PKind.OPERATION, operation = Some(POperation(opType, args.toList)))
    def tuple(exprs: PTupleExpression*): PExpression =
      PExpression(PKind.TUPLE, tuple = Some(PTuple(exprs.toList)))
    def typedNull(typeTag: Int): PExpression = constant(PConstant(typeTag))
    def int32(v: Int): PExpression = constant(PConstant(PType.INT32, int32Value = Some(v)))
    def int64(v: Long): PExpression = constant(PConstant(PType.INT64, int64Value = Some(v)))
    def double(v: Double): PExpression =
      constant(PConstant(PType.DOUBLE, doubleValue = Some(v)))
    def bool(v: Boolean): PExpression = constant(PConstant(PType.BOOL, boolValue = Some(v)))
    def string(v: String): PExpression =
      constant(PConstant(PType.STRING, stringValue = Some(v)))
    def dataType(tag: Int): PExpression =
      constant(PConstant(PType.DATA_TYPE, dataTypeValue = Some(tag)))
  }

  /** common.OperationType tags (expressions.proto:42-252, exact numbers). */
  object POp {
    val ADD = 0; val MULTIPLY = 1; val SUBTRACT = 2; val DIVIDE_NULLING = 3
    val NEGATE = 4; val AND = 5; val OR = 6; val NOT = 7
    val EQUAL = 8; val NOT_EQUAL = 9; val GREATER = 10; val GREATER_OR_EQUAL = 11
    val LESS = 12; val LESS_OR_EQUAL = 13; val IS_NULL = 14
    val REGEXP_PARTIAL = 15; val IN = 16; val CASE = 17; val IF = 18
    val CAST = 19; val IFNULL = 20; val MODULUS = 21; val IS_ODD = 22
    val IS_EVEN = 23; val AND_NOT = 24; val REGEXP_FULL = 25; val XOR = 26
    val CPP_DIVIDE = 30; val DIVIDE_SIGNALING = 35; val DIVIDE = 36
    val DIVIDE_QUIET = 37
    val BITWISE_AND = 50; val BITWISE_OR = 51; val BITWISE_NOT = 52
    val BITWISE_XOR = 53; val SHIFT_LEFT = 54; val SHIFT_RIGHT = 55
    val COPY = 60
    val ROUND_TO_INT = 100; val TRUNC = 101; val CEIL_TO_INT = 102
    val EXP = 103; val FLOOR_TO_INT = 104; val LN = 105; val LOG10 = 106
    val SQRT_QUIET = 107; val LOG = 108; val IS_FINITE = 109; val IS_INF = 110
    val IS_NAN = 111; val IS_NORMAL = 112; val ROUND = 113; val CEIL = 114
    val FLOOR = 115; val SIN = 117; val COS = 118; val TAN = 119
    val SQRT_SIGNALING = 120; val SQRT_NULLING = 121; val SQRT = 122
    val PI = 123; val POWER_SIGNALING = 124; val POWER_NULLING = 125
    val POWER_QUIET = 126
    val LENGTH = 150; val LTRIM = 151; val RTRIM = 152; val TRIM = 153
    val TOUPPER = 154; val TOLOWER = 155; val SUBSTRING = 156
    val CONCATENATE = 157; val TOSTRING = 158; val STRING_OFFSET = 159
    val REPLACE = 160
    val UNIXTIMESTAMP = 170; val FROMUNIXTIME = 171; val MAKEDATE = 172
    val YEAR_LOCAL = 173; val MONTH_LOCAL = 174; val DAY_LOCAL = 175
    val WEEKDAY_LOCAL = 176; val YEARDAY_LOCAL = 177; val HOUR_LOCAL = 178
    val MINUTE_LOCAL = 179; val SECOND = 180; val MICROSECOND = 181
    val QUARTER_LOCAL = 182; val MAKEDATETIME = 183; val DATEDIFF = 184
    val DATETIMEDIFF = 185; val DATE_FORMAT_LOCAL = 189; val FORMAT = 190
    val ADD_DAY = 201; val ADD_WEEK = 202; val ADD_MONTH = 203; val ADD_YEAR = 204
    val TRUNC_TO_SECOND = 205; val TRUNC_TO_MINUTE = 206; val TRUNC_TO_HOUR = 207
    val TRUNC_TO_DAY = 208; val TRUNC_TO_MONTH = 209; val TRUNC_TO_QUARTER = 210
    val TRUNC_TO_YEAR = 211
    val REGEXP_EXTRACT = 221; val REGEXP_REPLACE = 222; val ADD_MINUTE = 223
    val RANDOM_INT32 = 224; val SEQUENCE = 225; val PARSE_STRING = 226
    val DATE_FORMAT_UTC = 227
    val YEAR_UTC = 228; val MONTH_UTC = 229; val DAY_UTC = 230
    val WEEKDAY_UTC = 231; val YEARDAY_UTC = 232; val HOUR_UTC = 233
    val MINUTE_UTC = 234; val QUARTER_UTC = 235
    // expression/proto/operators.proto:173-174 (ext/hashing)
    val FINGERPRINT = 700; val HASH = 704
  }

  // ===== encoders =====

  private def encodeConstantInto(w: Writer, c: PConstant): Unit = {
    w.varintField(1, c.typeTag.toLong)
    c.int32Value.foreach(v => w.varintField(2, v.toLong)) // sign-extended
    c.int64Value.foreach(v => w.varintField(3, v))
    c.uint32Value.foreach(v => w.varintField(4, v & 0xffffffffL))
    c.uint64Value.foreach(v => w.varintField(5, v.longValue)) // two's complement
    c.floatValue.foreach(v => w.floatField(6, v))
    c.doubleValue.foreach(v => w.doubleField(7, v))
    c.boolValue.foreach(v => w.boolField(8, v))
    c.dateValue.foreach(v => w.varintField(9, v.toLong))
    c.datetimeValue.foreach(v => w.varintField(10, v))
    c.binaryValue.foreach(v => w.bytesField(11, v.toArray))
    c.stringValue.foreach(v => w.stringField(12, v))
    c.dataTypeValue.foreach(v => w.varintField(13, v.toLong))
  }

  private def encodeExpressionInto(w: Writer, e: PExpression): Unit = {
    w.varintField(1, e.kind.toLong)
    e.constant.foreach(c => w.messageField(2, encodeConstantInto(_, c)))
    e.variable.foreach(v => w.messageField(3, _.stringField(1, v.name)))
    e.operation.foreach { op =>
      w.messageField(4, { ow =>
        ow.varintField(1, op.opType.toLong)
        op.args.foreach(a => ow.messageField(2, encodeExpressionInto(_, a)))
      })
    }
    e.functionCall.foreach { fc =>
      w.messageField(5, { fw =>
        fw.stringField(1, fc.functionName)
        fc.args.foreach(a => fw.messageField(2, encodeExpressionInto(_, a)))
      })
    }
    e.tuple.foreach { t =>
      w.messageField(6, { tw =>
        t.exprs.foreach { te =>
          tw.messageField(1, { tew =>
            tew.messageField(1, encodeExpressionInto(_, te.expr))
            te.aliases.foreach(a => tew.stringField(2, a))
          })
        }
      })
    }
    e.path.foreach { p =>
      w.messageField(7, { pw => p.nodes.foreach(n => pw.stringField(1, n)) })
    }
  }

  /** Serialize an ExpressionDescription to protobuf wire bytes. */
  def encode(e: PExpression): Array[Byte] = {
    val w = new Writer; encodeExpressionInto(w, e); w.bytes
  }

  // ===== decoders =====

  private def decodeConstant(r: Reader): PConstant = {
    var c = PConstant(typeTag = -1)
    while (r.hasMore) r.readTag() match {
      case (1, 0) => c = c.copy(typeTag = r.readVarint().toInt)
      case (2, 0) => c = c.copy(int32Value = Some(r.readVarint().toInt))
      case (3, 0) => c = c.copy(int64Value = Some(r.readVarint()))
      case (4, 0) => c = c.copy(uint32Value = Some(r.readVarint() & 0xffffffffL))
      case (5, 0) =>
        val raw = r.readVarint()
        c = c.copy(uint64Value = Some(BigInt(java.lang.Long.toUnsignedString(raw))))
      case (6, 5) => c = c.copy(floatValue =
        Some(java.lang.Float.intBitsToFloat(r.readFixed32())))
      case (7, 1) => c = c.copy(doubleValue =
        Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
      case (8, 0) => c = c.copy(boolValue = Some(r.readVarint() != 0))
      case (9, 0) => c = c.copy(dateValue = Some(r.readVarint().toInt))
      case (10, 0) => c = c.copy(datetimeValue = Some(r.readVarint()))
      case (11, 2) => c = c.copy(binaryValue = Some(r.readBytes().toSeq))
      case (12, 2) => c = c.copy(stringValue = Some(r.readString()))
      case (13, 0) => c = c.copy(dataTypeValue = Some(r.readVarint().toInt))
      case (_, wire) => r.skip(wire)
    }
    require(c.typeTag >= 0, "Constant: required field 'type' missing")
    c
  }

  private def decodeVariable(r: Reader): PVariable = {
    var name: String = null
    while (r.hasMore) r.readTag() match {
      case (1, 2) => name = r.readString()
      case (_, wire) => r.skip(wire)
    }
    require(name != null, "Variable: required field 'name' missing")
    PVariable(name)
  }

  private def decodeOperation(r: Reader): POperation = {
    var op = -1; val args = List.newBuilder[PExpression]
    while (r.hasMore) r.readTag() match {
      case (1, 0) => op = r.readVarint().toInt
      case (2, 2) => args += decodeExpression(r.subReader())
      case (_, wire) => r.skip(wire)
    }
    require(op >= 0, "OperationDescription: required field 'type' missing")
    POperation(op, args.result())
  }

  private def decodeFunctionCall(r: Reader): PFunctionCall = {
    var name: String = null; val args = List.newBuilder[PExpression]
    while (r.hasMore) r.readTag() match {
      case (1, 2) => name = r.readString()
      case (2, 2) => args += decodeExpression(r.subReader())
      case (_, wire) => r.skip(wire)
    }
    require(name != null, "CustomFunctionCall: required field 'function_name' missing")
    PFunctionCall(name, args.result())
  }

  private def decodeTupleExpression(r: Reader): PTupleExpression = {
    var expr: PExpression = null; val aliases = List.newBuilder[String]
    while (r.hasMore) r.readTag() match {
      case (1, 2) => expr = decodeExpression(r.subReader())
      case (2, 2) => aliases += r.readString()
      case (_, wire) => r.skip(wire)
    }
    require(expr != null, "TupleExpression: required field 'expression' missing")
    PTupleExpression(expr, aliases.result())
  }

  private def decodeTuple(r: Reader): PTuple = {
    val exprs = List.newBuilder[PTupleExpression]
    while (r.hasMore) r.readTag() match {
      case (1, 2) => exprs += decodeTupleExpression(r.subReader())
      case (_, wire) => r.skip(wire)
    }
    PTuple(exprs.result())
  }

  private def decodePath(r: Reader): PPath = {
    val nodes = List.newBuilder[String]
    while (r.hasMore) r.readTag() match {
      case (1, 2) => nodes += r.readString()
      case (_, wire) => r.skip(wire)
    }
    PPath(nodes.result())
  }

  private def decodeExpression(r: Reader): PExpression = {
    var e = PExpression(kind = -1)
    while (r.hasMore) r.readTag() match {
      case (1, 0) => e = e.copy(kind = r.readVarint().toInt)
      case (2, 2) => e = e.copy(constant = Some(decodeConstant(r.subReader())))
      case (3, 2) => e = e.copy(variable = Some(decodeVariable(r.subReader())))
      case (4, 2) => e = e.copy(operation = Some(decodeOperation(r.subReader())))
      case (5, 2) => e = e.copy(functionCall = Some(decodeFunctionCall(r.subReader())))
      case (6, 2) => e = e.copy(tuple = Some(decodeTuple(r.subReader())))
      case (7, 2) => e = e.copy(path = Some(decodePath(r.subReader())))
      case (_, wire) => r.skip(wire)
    }
    require(e.kind >= 0, "ExpressionDescription: required field 'type' missing")
    e
  }

  /** Parse an ExpressionDescription from protobuf wire bytes. */
  def decode(bytes: Array[Byte]): PExpression = decodeExpression(new Reader(bytes))

  // ===== rebuild: messages → Catalyst columns =====

  /** BuildConstantFromProto (build_expression_from_proto.cc:186-192): the
    * value slot selected by `type`; no value set = typed NULL. */
  private def constantToColumn(c: PConstant): Column = c.typeTag match {
    case PType.STRING => c.stringValue.map(lit(_)).getOrElse(Exprs.nullOf(StringType))
    case PType.INT32 => c.int32Value.map(lit(_)).getOrElse(Exprs.nullOf(IntegerType))
    case PType.INT64 => c.int64Value.map(lit(_)).getOrElse(Exprs.nullOf(LongType))
    case PType.UINT64 => c.uint64Value
      .map(v => lit(BigDecimal(v)).cast(DecimalType(20, 0)))
      .getOrElse(Exprs.nullOf(DecimalType(20, 0)))
    case PType.DATETIME => c.datetimeValue.map(v => Exprs.civilFromMicros(lit(v)))
      .getOrElse(Exprs.nullOf(TimestampNTZType))
    case PType.DOUBLE => c.doubleValue.map(lit(_)).getOrElse(Exprs.nullOf(DoubleType))
    case PType.BOOL => c.boolValue.map(lit(_)).getOrElse(Exprs.nullOf(BooleanType))
    case PType.BINARY => c.binaryValue.map(v => lit(v.toArray))
      .getOrElse(Exprs.nullOf(BinaryType))
    case PType.UINT32 => c.uint32Value.map(lit(_)).getOrElse(Exprs.nullOf(LongType))
    case PType.FLOAT => c.floatValue.map(lit(_)).getOrElse(Exprs.nullOf(FloatType))
    case PType.DATE => c.dateValue
      .map(v => lit(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong))))
      .getOrElse(Exprs.nullOf(DateType))
    case t => throw new IllegalArgumentException(
      s"Constant of type tag $t not supported here (DATA_TYPE is CAST/PARSE-only; " +
        "ENUM constants are unsupported, matching the reference)")
  }

  /** The DATA_TYPE constant CAST / PARSE_STRING require as their first
    * argument (MakeCastOperation, build_expression_from_proto.cc:457-483). */
  private def dataTypeArg(e: PExpression, opName: String): DataType = {
    val c = e.constant.getOrElse(throw new IllegalArgumentException(
      s"$opName: first argument must be a DATA_TYPE constant"))
    require(e.kind == PKind.CONSTANT && c.typeTag == PType.DATA_TYPE,
      s"$opName: first argument must be a DATA_TYPE constant")
    PType.toSpark(c.dataTypeValue.getOrElse(throw new IllegalArgumentException(
      s"$opName: DATA_TYPE constant is NULL")))
  }

  /** The constant-string pattern REGEXP_* require as an argument
    * (MakeRegexpOperation, build_expression_from_proto.cc:349-392). */
  private def constantString(e: PExpression, opName: String): String = {
    val c = e.constant.getOrElse(throw new IllegalArgumentException(
      s"$opName: argument must be a constant STRING"))
    require(c.typeTag == PType.STRING, s"$opName: pattern must be a STRING constant")
    c.stringValue.getOrElse(throw new IllegalArgumentException(
      s"$opName: pattern constant is NULL"))
  }

  private def operationToColumn(op: POperation): Column = {
    import POp._
    val n = op.args.size
    def arg(i: Int): Column = toColumn(op.args(i))
    def arity(k: Int): Unit = require(n == k,
      s"operation ${op.opType}: expected $k arguments, received $n")
    def unary(f: Column => Column): Column = { arity(1); f(arg(0)) }
    def binary(f: (Column, Column) => Column): Column = { arity(2); f(arg(0), arg(1)) }
    def ternary(f: (Column, Column, Column) => Column): Column =
      { arity(3); f(arg(0), arg(1), arg(2)) }

    op.opType match {
      // arithmetic (tags: expressions.proto:45-66)
      case ADD => binary(Exprs.plus)
      case MULTIPLY => binary(Exprs.multiply)
      case SUBTRACT => binary(Exprs.minus)
      case DIVIDE | DIVIDE_QUIET => binary(Exprs.divide) // IEEE double division
      case DIVIDE_NULLING => binary(Exprs.divideNulling)
      case DIVIDE_SIGNALING => binary(Exprs.divideSignaling)
      case CPP_DIVIDE => binary(Exprs.cppDivide)
      case MODULUS => binary(Exprs.modulus)
      case NEGATE => unary(Exprs.negate)
      case IS_ODD => unary(Exprs.isOdd)
      case IS_EVEN => unary(Exprs.isEven)
      // logic / comparison
      case AND => binary(Exprs.and)
      case OR => binary(Exprs.or)
      case AND_NOT => binary(Exprs.andNot)
      case XOR => binary(Exprs.xor)
      case NOT => unary(Exprs.not)
      case EQUAL => binary(Exprs.equal)
      case NOT_EQUAL => binary(Exprs.notEqual)
      case GREATER => binary(Exprs.greater)
      case GREATER_OR_EQUAL => binary(Exprs.greaterOrEqual)
      case LESS => binary(Exprs.less)
      case LESS_OR_EQUAL => binary(Exprs.lessOrEqual)
      case IS_NULL => unary(Exprs.isNull)
      case IFNULL => binary(Exprs.ifNull)
      case IF => ternary(Exprs.ifExpr)
      case CASE =>
        // CASE arg0 WHEN arg2 THEN arg3 ... ELSE arg1 (expressions.proto:102-105)
        require(n >= 2 && n % 2 == 0,
          s"CASE: expected an even argument count >= 2, received $n")
        val pairs = (2 until n by 2).map(i => (arg(i), arg(i + 1)))
        Exprs.caseExpr(arg(0), pairs, arg(1))
      case IN =>
        require(n >= 1, "IN: at least the needle is required")
        Exprs.in(arg(0), (1 until n).map(arg): _*)
      // bitwise
      case BITWISE_AND => binary(Exprs.bitwiseAnd)
      case BITWISE_OR => binary(Exprs.bitwiseOr)
      case BITWISE_NOT => unary(Exprs.bitwiseNot)
      case BITWISE_XOR => binary(Exprs.bitwiseXor)
      case SHIFT_LEFT => binary((a, b) => call_function("shiftleft", a, b.cast(IntegerType)))
      case SHIFT_RIGHT => binary((a, b) => call_function("shiftright", a, b.cast(IntegerType)))
      case COPY => unary(identity) // reference: NOT_IMPLEMENTED; natural identity here
      // math
      case ROUND =>
        if (n == 1) Exprs.roundE(arg(0))
        else if (n == 2) binary((a, b) => call_function("round", a, b.cast(IntegerType)))
        else throw new IllegalArgumentException(s"ROUND: expected 1 or 2 arguments, got $n")
      case ROUND_TO_INT => unary(Exprs.roundToInt)
      case TRUNC => unary(Exprs.truncE)
      case CEIL => unary(Exprs.ceilE)
      case CEIL_TO_INT => unary(Exprs.ceilToInt)
      case FLOOR => unary(Exprs.floorE)
      case FLOOR_TO_INT => unary(Exprs.floorToInt)
      case EXP => unary(Exprs.expE)
      case LN => unary(Exprs.ln)
      case LOG10 => unary(Exprs.log10E)
      case LOG => binary((base, a) => log(a) / log(base)) // Log(base, argument)
      case SQRT | SQRT_QUIET => unary(Exprs.sqrtE)
      case SQRT_NULLING => unary(Exprs.sqrtNulling)
      case SQRT_SIGNALING => unary(Exprs.sqrtSignaling)
      case POWER_QUIET => binary(Exprs.powerE)
      case POWER_NULLING => binary(Exprs.powNulling)
      case POWER_SIGNALING => binary(Exprs.powSignaling)
      case SIN => unary(Exprs.sinE)
      case COS => unary(Exprs.cosE)
      case TAN => unary(Exprs.tanE)
      case PI => { arity(0); Exprs.piE }
      case IS_FINITE => unary(Exprs.isFinite)
      case IS_INF => unary(Exprs.isInf)
      case IS_NAN => unary(Exprs.isNaNE)
      case IS_NORMAL => unary(Exprs.isNormal)
      // string
      case LENGTH => unary(Exprs.lengthE)
      case LTRIM => unary(Exprs.ltrimE)
      case RTRIM => unary(Exprs.rtrimE)
      case TRIM => unary(Exprs.trimE)
      case TOUPPER => unary(Exprs.toUpper)
      case TOLOWER => unary(Exprs.toLower)
      case SUBSTRING =>
        if (n == 2) binary(Exprs.trailingSubstring)
        else if (n == 3) ternary(Exprs.substringE)
        else throw new IllegalArgumentException(s"SUBSTRING: expected 2 or 3 arguments, got $n")
      case CONCATENATE =>
        require(n >= 1, "CONCATENATE: at least one argument required")
        Exprs.concatE((0 until n).map(arg): _*)
      case TOSTRING => unary(Exprs.toStringE)
      case STRING_OFFSET => binary((h, needle) => call_function("instr", h, needle))
      case REPLACE => ternary((c, s, r) => replace(c, s, r))
      case PARSE_STRING =>
        arity(2)
        Exprs.parseStringNulling(dataTypeArg(op.args(0), "PARSE_STRING"))(arg(1))
      case CAST =>
        arity(2)
        Exprs.castTo(dataTypeArg(op.args(0), "CAST"))(arg(1))
      // hashing (operators.proto:173-174) — exact hash.cc value parity.
      // The wire's UINT64 seed arrives as DECIMAL(20,0) (PType.toSpark);
      // fold it to the engine's two's-complement LongType carry. Seeds
      // already LONG pass through the otherwise-branch unchanged.
      case HASH => binary((v, seed) => Exprs.hashE(v,
        when(seed > lit(Long.MaxValue),
          (seed - lit(BigDecimal("18446744073709551616"))).cast(LongType))
          .otherwise(seed.cast(LongType))))
      case FINGERPRINT => unary(Exprs.fingerprint)
      // regexp: constant pattern required, like the reference
      case REGEXP_PARTIAL =>
        arity(2); Exprs.regexpPartialMatch(arg(0), constantString(op.args(1), "REGEXP_PARTIAL"))
      case REGEXP_FULL =>
        arity(2); Exprs.regexpFullMatch(arg(0), constantString(op.args(1), "REGEXP_FULL"))
      case REGEXP_EXTRACT =>
        arity(2); Exprs.regexpExtractE(arg(0), constantString(op.args(1), "REGEXP_EXTRACT"))
      case REGEXP_REPLACE =>
        arity(3)
        Exprs.regexpReplaceE(arg(0), constantString(op.args(1), "REGEXP_REPLACE"),
          constantString(op.args(2), "REGEXP_REPLACE"))
      // datetime — session timezone is UTC, so LOCAL == UTC extractors
      // (the proto's LOCAL variants "operate in the local timezone",
      // expressions.proto:196)
      case UNIXTIMESTAMP => unary(Exprs.unixTimestampE)
      case FROMUNIXTIME => unary(Exprs.fromUnixTime)
      case MAKEDATE => ternary(Exprs.makeDateE)
      case MAKEDATETIME =>
        arity(6); Exprs.makeDatetime(arg(0), arg(1), arg(2), arg(3), arg(4), arg(5))
      case YEAR_UTC | YEAR_LOCAL => unary(Exprs.yearE)
      case QUARTER_UTC | QUARTER_LOCAL => unary(Exprs.quarterE)
      case MONTH_UTC | MONTH_LOCAL => unary(Exprs.monthE)
      case DAY_UTC | DAY_LOCAL => unary(Exprs.dayE)
      // Monday = 0 (expressions.proto:200) — Spark's weekday agrees
      case WEEKDAY_UTC | WEEKDAY_LOCAL => unary(weekday)
      case YEARDAY_UTC | YEARDAY_LOCAL => unary(Exprs.yearDay)
      case HOUR_UTC | HOUR_LOCAL => unary(Exprs.hourE)
      case MINUTE_UTC | MINUTE_LOCAL => unary(Exprs.minuteE)
      case SECOND => unary(Exprs.secondE)
      case MICROSECOND => unary(Exprs.microsecondE)
      case ADD_MINUTE =>
        if (n == 1) Exprs.addMinutes(arg(0), lit(1))
        else if (n == 2) binary(Exprs.addMinutes)
        else throw new IllegalArgumentException(s"ADD_MINUTE: expected 1 or 2 arguments, got $n")
      case ADD_DAY =>
        if (n == 1) Exprs.addDays(arg(0), lit(1))
        else if (n == 2) binary(Exprs.addDays)
        else throw new IllegalArgumentException(s"ADD_DAY: expected 1 or 2 arguments, got $n")
      case ADD_MONTH =>
        if (n == 1) Exprs.addMonths(arg(0), lit(1))
        else if (n == 2) binary(Exprs.addMonths)
        else throw new IllegalArgumentException(s"ADD_MONTH: expected 1 or 2 arguments, got $n")
      // reference: NOT_IMPLEMENTED — natural Spark equivalents (superset)
      case ADD_WEEK =>
        if (n == 1) Exprs.addDays(arg(0), lit(7))
        else { arity(2); Exprs.addDays(arg(0), arg(1) * 7) }
      case ADD_YEAR =>
        if (n == 1) Exprs.addMonths(arg(0), lit(12))
        else { arity(2); Exprs.addMonths(arg(0), arg(1) * 12) }
      case DATEDIFF => binary((a, b) => datediff(a.cast(DateType), b.cast(DateType)))
      case DATETIMEDIFF => binary((a, b) =>
        Exprs.epochMicrosCivil(a) - Exprs.epochMicrosCivil(b))
      case TRUNC_TO_SECOND => unary(Exprs.dateTruncCivil("second", _))
      case TRUNC_TO_MINUTE => unary(Exprs.dateTruncCivil("minute", _))
      case TRUNC_TO_HOUR => unary(Exprs.dateTruncCivil("hour", _))
      case TRUNC_TO_DAY => unary(Exprs.dateTruncCivil("day", _))
      case TRUNC_TO_MONTH => unary(Exprs.dateTruncCivil("month", _))
      case TRUNC_TO_QUARTER => unary(Exprs.dateTruncCivil("quarter", _))
      case TRUNC_TO_YEAR => unary(Exprs.dateTruncCivil("year", _))
      case DATE_FORMAT_UTC | DATE_FORMAT_LOCAL =>
        arity(2)
        Exprs.dateFormat(arg(0), constantString(op.args(1), "DATE_FORMAT"))
      // various
      case FORMAT => binary(Exprs.formatSignaling)
      case RANDOM_INT32 => { arity(0); (rand() * Int.MaxValue).cast(IntegerType) }
      case SEQUENCE => { arity(0); monotonically_increasing_id() }
      case other => throw new IllegalArgumentException(
        s"OperationType tag $other not implemented")
    }
  }

  /** Rebuild a single-column expression (BuildExpressionFromProto,
    * build_expression_from_proto.cc:754-804). TUPLE payloads describe
    * multi-column results — use [[toColumns]] for those. */
  def toColumn(e: PExpression): Column = e.kind match {
    case PKind.CONSTANT => constantToColumn(e.constant.getOrElse(
      throw new IllegalArgumentException(
        "Type set to CONSTANT, but constant field is not set")))
    case PKind.VARIABLE => col(e.variable.getOrElse(
      throw new IllegalArgumentException(
        "Type set to VARIABLE, but variable field is not set")).name)
    case PKind.OPERATION => operationToColumn(e.operation.getOrElse(
      throw new IllegalArgumentException(
        "Type set to OPERATION, but operation field is not set")))
    case PKind.CUSTOM_FUNCTION_CALL =>
      // reference: NOT_IMPLEMENTED (build_expression_from_proto.cc:731-735);
      // here the call routes through Spark's function registry, which also
      // resolves graft's SQL-registered native expressions (superset)
      val fc = e.functionCall.getOrElse(throw new IllegalArgumentException(
        "Type set to CUSTOM_FUNCTION_CALL, but function_call field is not set"))
      call_function(fc.functionName, fc.args.map(toColumn): _*)
    case PKind.PATH =>
      // nested-column path (expressions.proto:288-290) — Spark dotted access
      val p = e.path.getOrElse(throw new IllegalArgumentException(
        "Type set to PATH, but path field is not set"))
      require(p.nodes.nonEmpty, "PATH: at least one node required")
      p.nodes.tail.foldLeft(col(p.nodes.head))(_.getField(_))
    case PKind.TUPLE => throw new IllegalArgumentException(
      "TUPLE describes a multi-column result — use toColumns")
    case k => throw new IllegalArgumentException(s"Unknown expression type tag $k")
  }

  /** Rebuild a TUPLE (CompoundExpression, build_expression_from_proto.cc:
    * 737-752) as the projection column list; non-tuples yield one column.
    * Each tuple member takes its alias when present (one alias per
    * single-column expression, like AddAsMulti with a 1-element list). */
  def toColumns(e: PExpression): Seq[Column] = e.kind match {
    case PKind.TUPLE =>
      val t = e.tuple.getOrElse(throw new IllegalArgumentException(
        "Type set to TUPLE, but tuple field is not set"))
      t.exprs.map { te =>
        val c = toColumn(te.expr)
        te.aliases match {
          case Nil => c
          case one :: Nil => c.as(one)
          case many => throw new IllegalArgumentException(
            s"TupleExpression: a single-column expression takes at most one alias, " +
              s"got ${many.size}")
        }
      }
    case _ => Seq(toColumn(e))
  }

  // ===== JSON DSL bridge =====

  private def ddlToProtoLiteral(value: String, ddl: String): PConstant = {
    val d = DataType.fromDDL(ddl)
    d match {
      case IntegerType | ShortType | ByteType =>
        PConstant(PType.INT32, int32Value = Some(value.trim.toInt))
      case LongType => PConstant(PType.INT64, int64Value = Some(value.trim.toLong))
      case DoubleType => PConstant(PType.DOUBLE, doubleValue = Some(value.trim.toDouble))
      case FloatType => PConstant(PType.FLOAT, floatValue = Some(value.trim.toFloat))
      case BooleanType => PConstant(PType.BOOL, boolValue = Some(value.trim.toBoolean))
      case StringType => PConstant(PType.STRING, stringValue = Some(value))
      case DateType => PConstant(PType.DATE,
        dateValue = Some(java.time.LocalDate.parse(value.trim).toEpochDay.toInt))
      case TimestampType | TimestampNTZType =>
        // accept the same 'yyyy-MM-dd HH:mm:ss[.ffffff]' literals the JSON
        // DSL does (Instant.parse demanded an ISO offset and truncated to
        // millis); exact epoch micros via civil UTC read
        val civil = java.time.LocalDateTime.parse(value.trim.replace(' ', 'T'))
        PConstant(PType.DATETIME, datetimeValue = Some(
          java.time.temporal.ChronoUnit.MICROS.between(
            java.time.LocalDateTime.of(1970, 1, 1, 0, 0), civil)))
      case other => throw new IllegalArgumentException(
        s"no proto literal encoding for DDL type $other")
    }
  }

  /** Lower a [[QuerySpecs.ExprSpec]] JSON-DSL tree onto the proto message
    * model, so the same serialized spec can ship as protobuf bytes. The
    * mapping picks the OperationType whose reference semantics match what
    * [[QuerySpecs.toColumn]] builds (e.g. DSL `div` → DIVIDE_NULLING:
    * Spark's `/` NULLs on zero-divide with ANSI off). */
  def fromExprSpec(e: QuerySpecs.ExprSpec): PExpression = {
    import QuerySpecs.ExprSpec
    def kids: List[PExpression] = e.children.map(fromExprSpec)
    def opNode(tag: Int): PExpression =
      PExpression(PKind.OPERATION, operation = Some(POperation(tag, kids)))
    e.op match {
      case "col" => PExpression.variable(e.column.getOrElse(
        throw new IllegalArgumentException("col node needs 'column'")))
      case "lit" => PExpression.constant(
        ddlToProtoLiteral(e.value.getOrElse(
          throw new IllegalArgumentException("lit node needs 'value'")),
          e.valueType.getOrElse("STRING")))
      case "eq" => opNode(POp.EQUAL)
      case "neq" => opNode(POp.NOT_EQUAL)
      case "lt" => opNode(POp.LESS)
      case "le" => opNode(POp.LESS_OR_EQUAL)
      case "gt" => opNode(POp.GREATER)
      case "ge" => opNode(POp.GREATER_OR_EQUAL)
      case "and" => opNode(POp.AND)
      case "or" => opNode(POp.OR)
      case "not" => opNode(POp.NOT)
      case "isnull" => opNode(POp.IS_NULL)
      case "add" => opNode(POp.ADD)
      case "sub" => opNode(POp.SUBTRACT)
      case "mul" => opNode(POp.MULTIPLY)
      case "div" => opNode(POp.DIVIDE_NULLING)
      case "mod" => opNode(POp.MODULUS)
      case "concat" => opNode(POp.CONCATENATE)
      case "substr" => opNode(POp.SUBSTRING)
      case "lower" => opNode(POp.TOLOWER)
      case "upper" => opNode(POp.TOUPPER)
      case "in" => opNode(POp.IN)
      case "fingerprint" => opNode(POp.FINGERPRINT)
      case "hash" => opNode(POp.HASH)
      case "case" =>
        // DSL: alternating (when, then) pairs + optional trailing else.
        // Proto: CASE arg0 WHEN arg2 THEN arg3 ... ELSE arg1, searched form
        // = scrutinee TRUE (expressions.proto:102-104: "If there is no CASE
        // value true constant should be passed... no ELSE value, null
        // constant should be passed"). The proto wire requires a TYPED null
        // for the missing-else slot; STRING is the choice here, so an
        // else-less CASE over non-string THENs coerces to string on this
        // wire — give an explicit else (as the reference docs advise) to
        // keep the branch type.
        val cs = kids
        val hasElse = cs.size % 2 == 1
        val pairs = if (hasElse) cs.dropRight(1) else cs
        val elseArg = if (hasElse) cs.last else PExpression.typedNull(PType.STRING)
        PExpression(PKind.OPERATION, operation = Some(POperation(POp.CASE,
          PExpression.bool(true) :: elseArg :: pairs)))
      case other => throw new IllegalArgumentException(
        s"no proto lowering for DSL op '$other'")
    }
  }

  /** Lower a projection spec as a TUPLE message (CompoundExpression). */
  def fromProjectSpec(p: QuerySpecs.ProjectSpec): PExpression =
    PExpression(PKind.TUPLE, tuple = Some(PTuple(p.columns.map { f =>
      PTupleExpression(fromExprSpec(f.expr), f.as.toList)
    })))

  // ===== supersonic.ExtendedSortSpecification / Distinctness =====
  // (proto/specification.proto:12-37 — the OTHER messages the reference
  // ships across process boundaries, built by
  // cursor/core/specification_builder.h)

  /** ExtendedSortSpecification.Key (specification.proto:14-23).
    * `columnOrder`: ASCENDING=0 / DESCENDING=1 (supersonic.proto:102-105).
    * `caseSensitive` unset defaults to false = case-INSENSITIVE string
    * compare, which is how sort.cc consumes it (sort.cc:875,928: the
    * `!case_sensitive()` path folds string keys). */
  final case class PSortKey(attributeName: String,          // 1 (required)
                            columnOrder: Int,               // 2 (required enum)
                            caseSensitive: Option[Boolean] = None) // 3

  /** ExtendedSortSpecification (specification.proto:12-30): ordered keys,
    * most significant first; optional uint64 row limit. */
  final case class PSortSpec(keys: List[PSortKey] = Nil,    // 1 (repeated)
                             limit: Option[BigInt] = None)  // 2 (optional uint64)

  /** Distinctness (specification.proto:33-37). */
  final case class PDistinctness(isNotDistinct: Option[Boolean] = None,   // 1
                                 isExactDistinct: Option[Boolean] = None, // 2
                                 estimatedDistinctThreshold: Option[Int] = None) // 3

  object PColumnOrder { val ASCENDING = 0; val DESCENDING = 1 }

  def encodeSortSpec(s: PSortSpec): Array[Byte] = {
    val w = new Writer
    s.keys.foreach { k =>
      w.messageField(1, { kw =>
        kw.stringField(1, k.attributeName)
        kw.varintField(2, k.columnOrder.toLong)
        k.caseSensitive.foreach(kw.boolField(3, _))
      })
    }
    s.limit.foreach(v => w.varintField(2, v.longValue))
    w.bytes
  }

  private def decodeSortKey(r: Reader): PSortKey = {
    var name: String = null; var order = -1; var cs: Option[Boolean] = None
    while (r.hasMore) r.readTag() match {
      case (1, 2) => name = r.readString()
      case (2, 0) => order = r.readVarint().toInt
      case (3, 0) => cs = Some(r.readVarint() != 0)
      case (_, wire) => r.skip(wire)
    }
    require(name != null, "Key: required field 'attribute_name' missing")
    require(order >= 0, "Key: required field 'column_order' missing")
    PSortKey(name, order, cs)
  }

  def decodeSortSpec(bytes: Array[Byte]): PSortSpec = {
    val r = new Reader(bytes)
    val keys = List.newBuilder[PSortKey]; var limit: Option[BigInt] = None
    while (r.hasMore) r.readTag() match {
      case (1, 2) => keys += decodeSortKey(r.subReader())
      case (2, 0) =>
        limit = Some(BigInt(java.lang.Long.toUnsignedString(r.readVarint())))
      case (_, wire) => r.skip(wire)
    }
    PSortSpec(keys.result(), limit)
  }

  def encodeDistinctness(d: PDistinctness): Array[Byte] = {
    val w = new Writer
    d.isNotDistinct.foreach(w.boolField(1, _))
    d.isExactDistinct.foreach(w.boolField(2, _))
    d.estimatedDistinctThreshold.foreach(v => w.varintField(3, v.toLong))
    w.bytes
  }

  def decodeDistinctness(bytes: Array[Byte]): PDistinctness = {
    val r = new Reader(bytes)
    var d = PDistinctness()
    while (r.hasMore) r.readTag() match {
      case (1, 0) => d = d.copy(isNotDistinct = Some(r.readVarint() != 0))
      case (2, 0) => d = d.copy(isExactDistinct = Some(r.readVarint() != 0))
      case (3, 0) => d = d.copy(estimatedDistinctThreshold = Some(r.readVarint().toInt))
      case (_, wire) => r.skip(wire)
    }
    d
  }

  /** Proto sort spec → the engine's [[QuerySpecs.SortSpec]] (ExtendedSort:
    * case-insensitive keys + top-k). Unset case_sensitive = insensitive,
    * matching sort.cc's consumption of the proto default. */
  def toSortSpec(p: PSortSpec): QuerySpecs.SortSpec = QuerySpecs.SortSpec(
    p.keys.map { k =>
      require(k.columnOrder == PColumnOrder.ASCENDING ||
        k.columnOrder == PColumnOrder.DESCENDING,
        s"Key ${k.attributeName}: unknown ColumnOrder tag ${k.columnOrder}")
      QuerySpecs.SortKeySpec(k.attributeName,
        ascending = k.columnOrder == PColumnOrder.ASCENDING,
        caseInsensitive = !k.caseSensitive.getOrElse(false))
    },
    p.limit.map { v =>
      require(v >= 0 && v <= Int.MaxValue, s"limit $v out of range")
      v.toInt
    })

  /** [[QuerySpecs.SortSpec]] → proto messages (inverse of [[toSortSpec]]). */
  def fromSortSpec(s: QuerySpecs.SortSpec): PSortSpec = PSortSpec(
    s.keys.map { k =>
      PSortKey(k.column,
        if (k.ascending) PColumnOrder.ASCENDING else PColumnOrder.DESCENDING,
        caseSensitive = Some(!k.caseInsensitive))
    },
    s.limit.map(BigInt(_)))
}
