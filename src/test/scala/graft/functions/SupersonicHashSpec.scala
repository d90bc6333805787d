package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Golden-vector parity for SupersonicFingerprint/SupersonicHash.
  *
  * Every expected value below was produced by COMPILING THE REFERENCE'S OWN
  * `utils/hash/hash.cc` (Apache-2.0) and running its Fingerprint /
  * Hash64StringWithSeed / Hash64NumWithSeed / Hash64FloatWithSeed /
  * Hash64DoubleWithSeed / Hash32StringWithSeedReferenceImplementation entry
  * points on these inputs — so a pass here is bit-exact C++ parity, not
  * self-consistency. uint64s appear as Java Long two's complement
  * (java.lang.Long.parseUnsignedLong of the C++ decimal output).
  */
class SupersonicHashSpec extends SparkSpec {
  import spark.implicits._
  import SupersonicHashExpression._

  private def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  private val fpStrGolden = Seq(
    "" -> u("42"),
    "a" -> u("322122567263"),
    "ab" -> u("108074267130975"),
    "abc" -> u("27974098265586783"),
    "abcd" -> u("7233733753381076063"),
    "abcde" -> u("13670313997750384446"),
    "hello world" -> u("10977712378637050029"),
    "Customer#000000001" -> u("8527894632887754369"),
    "café" -> u("18070627867363203992")) // UTF-8 bytes 63 61 66 c3 a9

  private val h64StrSeed7Golden = Seq(
    "" -> u("7"),
    "a" -> u("438086683712"),
    "abcd" -> u("7233733903704931904"),
    "hello world" -> u("10963078029198099384"),
    "Customer#000000001" -> u("12980667290003345058"))

  test("string fingerprint matches the compiled reference (golden vectors)") {
    val df = fpStrGolden.map(_._1).toDF("s")
    val got = rows(df.select(supersonicFingerprint(col("s")))).map(_.head)
    assert(got == fpStrGolden.map(_._2))
    // object-level (interpreted) path agrees too
    fpStrGolden.foreach { case (s, exp) =>
      assert(SupersonicHashing.fingerprintBytes(s.getBytes("UTF-8")) == exp, s"for '$s'")
    }
  }

  test("string hash with explicit seed matches reference") {
    val df = h64StrSeed7Golden.map(_._1).toDF("s")
    val got = rows(df.select(supersonicHash(col("s"), lit(7L)))).map(_.head)
    assert(got == h64StrSeed7Golden.map(_._2))
  }

  test("binary input hashes raw bytes identically to the string's UTF-8") {
    val df = Seq(("hello world", "hello world".getBytes("UTF-8"))).toDF("s", "b")
    val Seq(Seq(hs, hb)) = rows(df.select(
      supersonicFingerprint(col("s")), supersonicFingerprint(col("b"))))
    assert(hs == hb && hs == u("10977712378637050029"))
  }

  test("int64 fingerprint = Hash64NumWithSeed(v, 42) over the 8-byte LE image") {
    val golden = Seq(
      0L -> u("13709535647262"),
      1L -> u("14285061269379"),
      -1L -> u("58415850235738"),
      42L -> u("37984691305308"),
      123456789L -> u("9796432731713154463"),
      -987654321L -> u("13862354258192208586"),
      Long.MaxValue -> u("9223430987428439898"),
      Long.MinValue -> u("9223385319041177118"))
    val got = rows(golden.map(_._1).toDF("v").select(supersonicFingerprint(col("v")))).map(_.head)
    assert(got == golden.map(_._2))
  }

  test("int32 SIGN-EXTENDS to uint64 before hashing (C++ int32->uint64 conversion)") {
    val golden = Seq(
      0 -> u("13709535647262"),  // == int64 0
      1 -> u("14285061269379"),
      -1 -> u("58415850235738"), // == int64 -1: 0xFFFFFFFFFFFFFFFF
      Int.MaxValue -> u("16237123819645"),
      Int.MinValue -> u("24178518354233"))
    val got = rows(golden.map(_._1).toDF("v").select(supersonicFingerprint(col("v")))).map(_.head)
    assert(got == golden.map(_._2))
  }

  test("bool routes through the integer path (true=1, false=0)") {
    val got = rows(Seq(true, false).toDF("v").select(supersonicFingerprint(col("v")))).map(_.head)
    assert(got == Seq(u("14285061269379"), u("13709535647262")))
  }

  test("date/timestamp_ntz hash their internal day/micros counts") {
    val df = Seq(("2024-03-10", "2024-03-10 02:30:00"))
      .toDF("d", "t")
      .select(col("d").cast(DateType).as("d"), col("t").cast(TimestampNTZType).as("t"))
    val Seq(Seq(hd, ht)) = rows(df.select(
      supersonicFingerprint(col("d")), supersonicFingerprint(col("t"))))
    val days = java.time.LocalDate.parse("2024-03-10").toEpochDay
    val micros = java.time.LocalDateTime.parse("2024-03-10T02:30:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(hd == SupersonicHashing.hashLong(days, 42L))
    assert(ht == SupersonicHashing.hashLong(micros, 42L))
  }

  test("HASH accepts float (4-byte single chunk) and double (8-byte) — golden") {
    val fGolden = Seq(0.0f -> u("180388627062"), 1.0f -> u("4575657341055140470"),
      -1.5f -> u("13817044466604704374"), 3.14159f -> u("4632251457748166694"))
    val gotF = rows(fGolden.map(_._1).toDF("v").select(supersonicHash(col("v"), lit(42L)))).map(_.head)
    assert(gotF == fGolden.map(_._2))
    val dGolden = Seq(0.0 -> u("13709535647262"), 1.0 -> u("4607195948793239070"),
      -1.5 -> u("13832820389018375710"), 3.141592653589793 -> u("9065494633835853749"))
    val gotD = rows(dGolden.map(_._1).toDF("v").select(supersonicHash(col("v"), lit(42L)))).map(_.head)
    assert(gotD == dGolden.map(_._2))
  }

  test("FINGERPRINT rejects float/double at bind time (factory returns NULL in ref)") {
    val df = Seq(1.0).toDF("v")
    intercept[Exception] { df.select(supersonicFingerprint(col("v"))).collect() }
    val df2 = Seq(1.0f).toDF("v")
    intercept[Exception] { df2.select(supersonicFingerprint(col("v"))).collect() }
  }

  test("seed is an expression column, not a constant (hash(v, seed_col))") {
    val df = Seq((0L, 42L), (1L, 42L), (0L, 7L)).toDF("v", "seed")
    val got = rows(df.select(supersonicHash(col("v"), col("seed")))).map(_.head)
    assert(got(0) == u("13709535647262") && got(1) == u("14285061269379"))
    assert(got(2) == SupersonicHashing.hashLong(0L, 7L))
  }

  test("null propagates (value or seed)") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", null), Row(null, 7L)),
      StructType(Seq(StructField("s", StringType), StructField("seed", LongType))))
    val got = rows(df.select(supersonicHash(col("s"), col("seed")))).map(_.head)
    assert(got == Seq(null, null))
  }

  test("SQL registration: supersonic_fingerprint / supersonic_hash") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT supersonic_fingerprint('abcd'), supersonic_hash('abcd', CAST(7 AS BIGINT))")
      .collect()(0)
    assert(got.getLong(0) == u("7233733753381076063"))
    assert(got.getLong(1) == u("7233733903704931904"))
  }

  test("Hash32StringWithSeed reference implementation (utility face) — golden") {
    val golden = Seq(
      "" -> 1,
      "a" -> 6296402,
      "ab" -> 1651874130.toInt,
      "abc" -> java.lang.Integer.parseUnsignedInt("3234976683"),
      "abcd" -> java.lang.Integer.parseUnsignedInt("2764668843"),
      "abcde" -> 21520736,
      "hello world" -> java.lang.Integer.parseUnsignedInt("2915261909"),
      "Customer#000000001" -> 1046333430)
    golden.foreach { case (s, exp) =>
      assert(SupersonicHashing.hash32Bytes(s.getBytes("UTF-8"), 1) == exp, s"for '$s'")
    }
  }

  test("interpreted eval and codegen agree (disable wholestage)") {
    val data = Seq("", "a", "xyzzy-plugh", "ééé")
    val df = data.toDF("s")
    val withCg = rows(df.select(supersonicFingerprint(col("s")))).map(_.head)
    withConfs("spark.sql.codegen.wholeStage" -> "false") {
      val noCg = rows(df.select(supersonicFingerprint(col("s")))).map(_.head)
      assert(withCg == noCg)
    }
  }
}
