package graft.plans

import graft.SparkSpec
import ProtoWire._

/** Wire-parity suite for the protobuf expression serialization.
  *
  * The golden-byte tests pin the EXACT octets the public proto2 wire format
  * produces for the reference's `common.ExpressionDescription` messages
  * (utils/proto/expressions.proto) — hand-derived from the published
  * encoding rules (varint, tag = field<<3|wire, length-delimited embedded
  * messages), so parity holds against any standard protobuf library without
  * linking one.
  */
class ProtoWireSpec extends SparkSpec {

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString(" ")

  // ===== golden bytes =====

  test("golden bytes: VARIABLE expression") {
    // ExpressionDescription{type: VARIABLE(1), variable{name: "x"}}
    // field1 varint 1 → 08 01; field3 msg → 1a 03 (inner: 0a 01 'x'=78)
    val e = PExpression.variable("x")
    assert(hex(encode(e)) === "08 01 1a 03 0a 01 78")
    assert(decode(encode(e)) === e)
  }

  test("golden bytes: INT64 constant 150") {
    // ExpressionDescription{type: CONSTANT(0), constant{type: INT64(2),
    //   int64_value: 150}}
    // 08 00 | 12 05 (constant msg: 08 02 | 18 96 01 — 150 varint = 96 01)
    val e = PExpression.int64(150L)
    assert(hex(encode(e)) === "08 00 12 05 08 02 18 96 01")
    assert(decode(encode(e)) === e)
  }

  test("golden bytes: negative int32 sign-extends to 10-byte varint") {
    // proto2 int32 -2 encodes as the 64-bit two's complement varint:
    // fe ff ff ff ff ff ff ff ff 01
    val e = PExpression.constant(PConstant(PType.INT32, int32Value = Some(-2)))
    assert(hex(encode(e)) ===
      "08 00 12 0d 08 01 10 fe ff ff ff ff ff ff ff ff 01")
    assert(decode(encode(e)) === e)
  }

  test("golden bytes: ADD(x, 1) operation") {
    // ExpressionDescription{type: OPERATION(2), operation{type: ADD(0),
    //   argument: [variable x, constant int32 1]}}
    val e = PExpression.operation(POp.ADD,
      PExpression.variable("x"),
      PExpression.constant(PConstant(PType.INT32, int32Value = Some(1))))
    // outer: 08 02 | 22 12 — operation msg (18 bytes):
    //   08 00 (type ADD)
    //   12 07 arg0: 08 01 1a 03 0a 01 78
    //   12 06 arg1: 08 00 12 02 08 01 ... wait: constant{type:INT32(1),
    //     int32_value:1} = 08 01 10 01 (4 bytes) → arg1 = 08 00 12 04 08 01
    //     10 01 (8 bytes) → 12 08 prefix
    assert(hex(encode(e)) ===
      "08 02 22 15 08 00 12 07 08 01 1a 03 0a 01 78 12 08 08 00 12 04 08 01 10 01")
    assert(decode(encode(e)) === e)
  }

  test("golden bytes: double constant uses little-endian fixed64") {
    // 1.5 = 0x3FF8000000000000 → LE bytes 00 00 00 00 00 00 f8 3f at field 7
    val e = PExpression.double(1.5)
    assert(hex(encode(e)) === "08 00 12 0b 08 05 39 00 00 00 00 00 00 f8 3f")
    assert(decode(encode(e)) === e)
  }

  test("golden bytes: string constant is UTF-8 length-delimited") {
    // constant{type: STRING(0), string_value: "ab"} — field 12 tag = 62
    val e = PExpression.string("ab")
    assert(hex(encode(e)) === "08 00 12 06 08 00 62 02 61 62")
    assert(decode(encode(e)) === e)
  }

  // ===== round-trips =====

  test("lossless round-trip across every message kind") {
    val cases = Seq(
      PExpression.typedNull(PType.DATETIME),
      PExpression.constant(PConstant(PType.UINT64,
        uint64Value = Some(BigInt("18446744073709551615")))), // 2^64-1
      PExpression.constant(PConstant(PType.UINT32, uint32Value = Some(4294967295L))),
      PExpression.constant(PConstant(PType.FLOAT, floatValue = Some(2.5f))),
      PExpression.constant(PConstant(PType.BOOL, boolValue = Some(true))),
      PExpression.constant(PConstant(PType.DATE, dateValue = Some(19000))),
      PExpression.constant(PConstant(PType.DATETIME,
        datetimeValue = Some(1700000000000000L))),
      PExpression.constant(PConstant(PType.BINARY,
        binaryValue = Some(Seq[Byte](0, 1, -1, 127)))),
      PExpression(PKind.CUSTOM_FUNCTION_CALL,
        functionCall = Some(PFunctionCall("upper", List(PExpression.string("a"))))),
      PExpression(PKind.PATH, path = Some(PPath(List("s", "nested", "leaf")))),
      PExpression.tuple(
        PTupleExpression(PExpression.variable("a"), List("renamed")),
        PTupleExpression(PExpression.operation(POp.ADD,
          PExpression.variable("a"), PExpression.int32(1)))),
      PExpression.operation(POp.CASE,
        PExpression.bool(true), PExpression.string("else"),
        PExpression.operation(POp.IS_NULL, PExpression.variable("x")),
        PExpression.string("null!")))
    cases.foreach { e => assert(decode(encode(e)) === e, s"round-trip failed for $e") }
  }

  test("unknown fields are skipped (forward compatibility)") {
    // A writer from a NEWER schema: ExpressionDescription with an unknown
    // varint field 15 and unknown length-delimited field 14 interleaved.
    val w = new ProtoWire.Writer
    w.varintField(1, 1)                     // type = VARIABLE
    w.varintField(15, 999)                  // unknown varint
    w.bytesField(14, Array[Byte](1, 2, 3))  // unknown bytes
    w.messageField(3, _.stringField(1, "y"))
    assert(decode(w.bytes) === PExpression.variable("y"))
  }

  test("required-field violations and bad payloads fail loudly") {
    intercept[IllegalArgumentException](decode(Array[Byte](0x12, 0x00))) // no type
    // type says CONSTANT but no constant payload → toColumn rejects
    val e = decode(encode(PExpression.variable("x"))).copy(kind = PKind.CONSTANT,
      variable = None)
    intercept[IllegalArgumentException](toColumn(e))
    // ENUM constants unsupported, like the reference
    intercept[IllegalArgumentException](
      toColumn(PExpression.constant(PConstant(PType.ENUM))))
    // NULL_TYPE rejected by ResolveType parity (tags 0..11 only)
    intercept[IllegalArgumentException](
      toColumn(PExpression.operation(POp.CAST,
        PExpression.dataType(PType.NULL_TYPE), PExpression.variable("x"))))
  }

  // ===== semantics: decoded trees evaluate correctly =====

  private def evalOne(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("decoded operation trees evaluate with reference semantics") {
    import spark.implicits._
    val df = Seq((1, 4.0, "Ab"), (2, 0.0, "cd")).toDF("i", "d", "s")
    val addMul = toColumn(decode(encode(PExpression.operation(POp.MULTIPLY,
      PExpression.operation(POp.ADD, PExpression.variable("i"), PExpression.int32(1)),
      PExpression.int32(10)))))
    assert(df.select(addMul).as[Int].collect().toSeq === Seq(20, 30))

    // DIVIDE_NULLING: zero divisor → NULL
    val divN = toColumn(decode(encode(PExpression.operation(POp.DIVIDE_NULLING,
      PExpression.double(8.0), PExpression.variable("d")))))
    assert(df.select(divN).collect().map(r => Option(r.get(0))).toSeq ===
      Seq(Some(2.0), None))

    // CASE arg0 WHEN arg2 THEN arg3 ELSE arg1 (scrutinee form)
    val kase = toColumn(decode(encode(PExpression.operation(POp.CASE,
      PExpression.variable("i"), PExpression.string("other"),
      PExpression.int32(1), PExpression.string("one")))))
    assert(df.select(kase).as[String].collect().toSeq === Seq("one", "other"))

    // CAST with DATA_TYPE constant first argument
    val cast = toColumn(decode(encode(PExpression.operation(POp.CAST,
      PExpression.dataType(PType.STRING), PExpression.variable("i")))))
    assert(df.select(cast).as[String].collect().toSeq === Seq("1", "2"))

    // REGEXP_PARTIAL requires a constant pattern (reference behavior) …
    intercept[IllegalArgumentException](
      toColumn(PExpression.operation(POp.REGEXP_PARTIAL,
        PExpression.variable("s"), PExpression.variable("s"))))
    // … and matches substrings when given one
    val re = toColumn(decode(encode(PExpression.operation(POp.REGEXP_PARTIAL,
      PExpression.variable("s"), PExpression.string("[A-Z]b")))))
    assert(df.select(re).as[Boolean].collect().toSeq === Seq(true, false))

    // typed NULL constant (no value field set)
    assert(evalOne(toColumn(decode(encode(PExpression.typedNull(PType.INT64))))) == null)

    // WEEKDAY is Monday=0 (expressions.proto:200): 2024-01-01 was a Monday
    val wd = toColumn(decode(encode(PExpression.operation(POp.WEEKDAY_UTC,
      PExpression.constant(PConstant(PType.DATE,
        dateValue = Some(java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt)))))))
    assert(evalOne(wd) === 0)

    // FINGERPRINT (tag 700) / HASH (tag 704) decode to the EXACT hash.cc
    // values (round 10): Fingerprint("abcd") and Hash64("abcd", 7) golden
    val fp = toColumn(decode(encode(PExpression.operation(POp.FINGERPRINT,
      PExpression.string("abcd")))))
    assert(evalOne(fp) === java.lang.Long.parseUnsignedLong("7233733753381076063"))
    val h = toColumn(decode(encode(PExpression.operation(POp.HASH,
      PExpression.string("abcd"),
      PExpression.constant(PConstant(PType.UINT64, uint64Value = Some(BigInt(7))))))))
    assert(evalOne(h) === java.lang.Long.parseUnsignedLong("7233733903704931904"))
    // a uint64 seed above 2^63 folds through the DECIMAL(20,0) carrier to
    // the two's-complement long the mixing expects
    val bigSeed = BigInt("9223372036854775815") // 2^63 + 7
    val hBig = toColumn(decode(encode(PExpression.operation(POp.HASH,
      PExpression.string("abcd"),
      PExpression.constant(PConstant(PType.UINT64, uint64Value = Some(bigSeed)))))))
    assert(evalOne(hBig) === graft.functions.SupersonicHashing.hashBytes(
      "abcd".getBytes("UTF-8"), bigSeed.longValue)) // longValue = two's complement
    // a reference-wire regexp with an RE2-only construct fails LOUDLY at
    // the dialect guard instead of silently changing meaning
    intercept[IllegalArgumentException](
      toColumn(decode(encode(PExpression.operation(POp.REGEXP_PARTIAL,
        PExpression.variable("s"), PExpression.string("a\\Cb"))))))
  }

  test("TUPLE rebuilds an aliased multi-column projection") {
    import spark.implicits._
    val df = Seq((2, 3)).toDF("a", "b")
    val t = decode(encode(PExpression.tuple(
      PTupleExpression(PExpression.variable("a"), List("x")),
      PTupleExpression(PExpression.operation(POp.ADD,
        PExpression.variable("a"), PExpression.variable("b")), List("sum")))))
    val out = df.select(toColumns(t): _*)
    assert(out.columns.toSeq === Seq("x", "sum"))
    assert(out.as[(Int, Int)].collect().toSeq === Seq((2, 5)))
  }

  test("ExtendedSortSpecification wire round-trip and SortSpec bridge") {
    // golden bytes: one key {attribute_name: "s", column_order: DESCENDING,
    // case_sensitive: true} + limit 5
    // key msg: 0a 01 73 | 10 01 | 18 01 → 7 bytes; outer: 0a 07 <key> 10 05
    val spec = PSortSpec(List(PSortKey("s", PColumnOrder.DESCENDING,
      Some(true))), limit = Some(BigInt(5)))
    assert(hex(encodeSortSpec(spec)) === "0a 07 0a 01 73 10 01 18 01 10 05")
    assert(decodeSortSpec(encodeSortSpec(spec)) === spec)

    // bridge semantics: proto default (case_sensitive unset) means
    // case-INSENSITIVE, like sort.cc's consumption
    val p2 = PSortSpec(List(
      PSortKey("a", PColumnOrder.ASCENDING),
      PSortKey("b", PColumnOrder.DESCENDING, Some(true))), None)
    val s2 = toSortSpec(p2)
    assert(s2 === QuerySpecs.SortSpec(List(
      QuerySpecs.SortKeySpec("a", ascending = true, caseInsensitive = true),
      QuerySpecs.SortKeySpec("b", ascending = false, caseInsensitive = false)),
      None))
    // inverse bridge is lossless modulo the explicit case_sensitive field
    assert(toSortSpec(fromSortSpec(s2)) === s2)
    // uint64 limit survives beyond Long range
    val big = decodeSortSpec(encodeSortSpec(
      PSortSpec(Nil, Some(BigInt("18446744073709551615")))))
    assert(big.limit === Some(BigInt("18446744073709551615")))
    intercept[IllegalArgumentException](toSortSpec(big)) // out of Int range
  }

  test("Distinctness wire round-trip") {
    val d = PDistinctness(isNotDistinct = Some(false),
      isExactDistinct = Some(true), estimatedDistinctThreshold = Some(1000))
    assert(hex(encodeDistinctness(d)) === "08 00 10 01 18 e8 07")
    assert(decodeDistinctness(encodeDistinctness(d)) === d)
    assert(decodeDistinctness(Array.emptyByteArray) === PDistinctness())
  }

  test("property: random message trees survive the wire losslessly") {
    val rng = new scala.util.Random(20260814L)
    def leaf(): PExpression = rng.nextInt(12) match {
      case 0 => PExpression.variable(s"c${rng.nextInt(5)}")
      case 1 => PExpression.int32(rng.nextInt())
      case 2 => PExpression.int64(rng.nextLong())
      case 3 => PExpression.double(rng.nextDouble() * 1e6 - 5e5)
      case 4 => PExpression.string(rng.alphanumeric.take(rng.nextInt(8)).mkString)
      case 5 => PExpression.bool(rng.nextBoolean())
      case 6 => PExpression.typedNull(rng.nextInt(11))
      case 7 => PExpression.constant(PConstant(PType.FLOAT,
        floatValue = Some(rng.nextFloat())))
      case 8 => PExpression.constant(PConstant(PType.UINT64,
        uint64Value = Some(BigInt(java.lang.Long.toUnsignedString(rng.nextLong())))))
      case 9 => PExpression.constant(PConstant(PType.DATE,
        dateValue = Some(rng.nextInt(30000))))
      case 10 => PExpression.constant(PConstant(PType.BINARY,
        binaryValue = Some(Array.fill(rng.nextInt(6))(rng.nextInt(256).toByte).toSeq)))
      case 11 => PExpression.constant(PConstant(PType.UINT32,
        uint32Value = Some(rng.nextInt(Int.MaxValue).toLong * 2)))
    }
    def tree(depth: Int): PExpression =
      if (depth == 0) leaf()
      else rng.nextInt(6) match {
        case 0 => PExpression.operation(POp.ADD, tree(depth - 1), tree(depth - 1))
        case 1 => PExpression.operation(POp.NOT, tree(depth - 1))
        case 2 => PExpression.operation(POp.IN,
          List.fill(1 + rng.nextInt(4))(tree(depth - 1)): _*)
        case 3 => PExpression.tuple(
          List.fill(1 + rng.nextInt(3))(PTupleExpression(tree(depth - 1),
            if (rng.nextBoolean()) List(s"a${rng.nextInt(9)}") else Nil)): _*)
        case 4 => PExpression(PKind.CUSTOM_FUNCTION_CALL, functionCall =
          Some(PFunctionCall(s"f${rng.nextInt(9)}", List(tree(depth - 1)))))
        case 5 => PExpression(PKind.PATH, path =
          Some(PPath(List.fill(1 + rng.nextInt(3))(s"n${rng.nextInt(9)}"))))
      }
    (1 to 300).foreach { i =>
      val t = tree(1 + rng.nextInt(4))
      assert(decode(encode(t)) === t, s"tree #$i")
    }
  }

  test("decoder never crashes on malformed bytes (fuzz)") {
    // Every failure mode must surface as IllegalArgumentException — a wire
    // bug that throws ArrayIndexOutOfBounds / NegativeArraySize / OOM on
    // attacker-controlled bytes would be a service hazard.
    val rnd = new scala.util.Random(42)
    var decoded = 0
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(40)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      try { decode(bytes); decoded += 1 }
      catch { case _: IllegalArgumentException => () }
    }
    // sanity: the fuzz actually exercised both paths
    assert(decoded > 0 && decoded < 2000)
  }

  test("JSON DSL specs lower to proto and rebuild identically") {
    import QuerySpecs._
    import QuerySpecs.ExprSpec._
    import spark.implicits._
    val df = Seq((1, 5.0, "A", "O"), (2, 0.5, "X", "F"), (3, 8.0, null, "O"))
      .toDF("ln", "qty", "flag", "status")
    val pred = ExprSpec.and(
      ExprSpec.ge(colRef("qty"), literal("2", "INT")),
      ExprSpec.not(ExprSpec.or(
        ExprSpec.eq(colRef("flag"), literal("X", "STRING")),
        ExprSpec.isNull(colRef("flag")))))
    val proj = ProjectSpec(List(
      ProjectField(colRef("flag")),
      ProjectField(ExprSpec.mul(colRef("ln"), literal("2", "INT")), as = Some("ln2")),
      ProjectField(ExprSpec.div(colRef("qty"), literal("4.0", "DOUBLE")),
        as = Some("qdiv")),
      ProjectField(ExprSpec.mod(colRef("ln"), literal("3", "INT")), as = Some("lmod")),
      ProjectField(ExprSpec.concat(ExprSpec.lower(colRef("flag")), literal("_", "STRING"),
        ExprSpec.substr(colRef("status"), literal("1", "INT"), literal("1", "INT"))),
        as = Some("tag")),
      ProjectField(ExprSpec.caseWhen(
        Seq(ExprSpec.in(colRef("flag"), literal("A", "STRING"),
          literal("R", "STRING")) -> literal("ret", "STRING")),
        otherwise = Some(literal("keep", "STRING"))), as = Some("fc"))))

    // both wires, same result
    val viaJson = df.filter(QuerySpecs.toColumn(pred))
      .select(proj.columns.map(f => f.as.fold(QuerySpecs.toColumn(f.expr))(
        QuerySpecs.toColumn(f.expr).as(_))): _*)
    val predBytes = ProtoWire.encode(ProtoWire.fromExprSpec(pred))
    val projBytes = ProtoWire.encode(ProtoWire.fromProjectSpec(proj))
    val viaProto = df.filter(ProtoWire.toColumn(ProtoWire.decode(predBytes)))
      .select(ProtoWire.toColumns(ProtoWire.decode(projBytes)): _*)
    assert(viaProto.columns.toSeq === viaJson.columns.toSeq)
    assert(rows(viaProto) === rows(viaJson))
    // and the decoded message trees are exactly what was encoded
    assert(ProtoWire.decode(predBytes) === ProtoWire.fromExprSpec(pred))
    assert(ProtoWire.decode(projBytes) === ProtoWire.fromProjectSpec(proj))
  }
}
