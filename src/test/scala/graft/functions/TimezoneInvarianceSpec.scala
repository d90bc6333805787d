package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Exprs => E}

/** The engine's time semantics are CIVIL: a timestamp is a wall clock
  * read as UTC (the reference's DATETIME is an int64 of UTC micros), so
  * no query result may depend on `spark.sql.session.timeZone` — a
  * cluster session's zone is whatever the user's conf says, and the
  * round-9 TZ sweep showed 15 gates drifting by the zone offset before
  * the civil-time refactor. This spec evaluates the date/time surface
  * under three session zones (UTC, America/Los_Angeles with DST, and the
  * half-hour offset +05:30 that breaks hour-aligned coincidences) and
  * requires bit-identical rows.
  */
class TimezoneInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private val zones = Seq("UTC", "America/Los_Angeles", "+05:30")

  private def underZones(df: => DataFrame): Seq[Seq[Seq[Any]]] =
    zones.map { z =>
      withConfs("spark.sql.session.timeZone" -> z)(rows(df))
    }

  private def assertInvariant(df: => DataFrame): Unit = {
    val all = underZones(df)
    for (i <- 1 until all.size)
      assert(all(i) == all.head,
        s"session zone ${zones(i)} changed the result:\n${all(i)}\nvs\n${all.head}")
  }

  private def civil: DataFrame =
    Seq("2024-03-10 01:30:00.123456", // spans the US spring-forward gap
        "2024-03-10 02:30:00",        // INSIDE the LA spring-forward gap —
                                      // a session-zone NTZ→LTZ round trip
                                      // renders this as 03:30 (ADVICE r9)
        "2024-11-03 01:30:00.000001", // ambiguous during fall-back
        "1997-07-01 23:59:59.999999",
        "1970-01-01 00:00:00")
      .toDF("s")
      .select(col("s"), to_timestamp_ntz(col("s")).as("ts"))

  test("civil epoch helpers are session-zone-invariant (incl. DST edges)") {
    assertInvariant(civil.select(col("s"),
      E.epochMicrosCivil(col("ts")).as("us"),
      E.epochMillisCivil(col("ts")).as("ms"),
      E.epochSecondsCivil(col("ts")).as("sec"),
      E.civilFromMicros(E.epochMicrosCivil(col("ts"))).as("roundtrip"),
      E.microsecondE(col("ts")).as("micro")))
    // and the values are the UTC reading, not any local one
    val got = civil.select(E.epochSecondsCivil(col("ts"))).as[Long].collect()
    assert(got.last == 0L)
  }

  test("field extractors, truncation and formatting read UTC fields under any zone") {
    assertInvariant(civil.select(col("s"),
      E.yearE(col("ts")).as("y"), E.monthE(col("ts")).as("m"),
      E.dayE(col("ts")).as("d"), E.hourE(col("ts")).as("h"),
      E.minuteE(col("ts")).as("mi"), E.secondE(col("ts")).as("sec"),
      E.weekdayE(col("ts")).as("dow"), E.yearDay(col("ts")).as("yd"),
      // dateTruncCivil asserted through the EPOCH, not the rendered
      // string: Spark's own date_trunc coerces NTZ through the session
      // zone and then renders back in the same zone, so a string
      // comparison is blind to the shifted instant (how the original
      // q_cohort_ltv bug hid from a string-level check)
      E.epochMicrosCivil(E.dateTruncCivil("second", col("ts"))).as("tr_s"),
      E.epochMicrosCivil(E.dateTruncCivil("minute", col("ts"))).as("tr_mi"),
      E.epochMicrosCivil(E.dateTruncCivil("hour", col("ts"))).as("tr_h"),
      E.epochMicrosCivil(E.dateTruncCivil("day", col("ts"))).as("tr_d"),
      E.epochMicrosCivil(E.dateTruncCivil("week", col("ts"))).as("tr_w"),
      E.epochMicrosCivil(E.dateTruncCivil("month", col("ts"))).as("tr_m"),
      E.epochMicrosCivil(E.dateTruncCivil("year", col("ts"))).as("tr_y"),
      to_date(col("ts")).as("dt"),
      E.dateFormat(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fmt")))
    // and civil truncation agrees with the UTC-session reading of Spark's
    // own date_trunc (the semantics every gate was verified against)
    withConfs("spark.sql.session.timeZone" -> "UTC") {
      val both = civil.select(
        E.epochMicrosCivil(E.dateTruncCivil("week", col("ts"))).as("civil"),
        unix_micros(date_trunc("week", col("ts").cast("timestamp"))).as("ltz"))
        .collect()
      both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("const factories, parse, make and arithmetic stay civil") {
    assertInvariant(civil.select(col("s"),
      E.constDateTime("2024-06-01 12:00:00").cast("string").as("cdt"),
      E.constDateTimeFromMicrosecondsSinceEpoch(1717243200000000L)
        .cast("string").as("cus"),
      E.constDateTimeFromSecondsSinceEpoch(1717243200L).cast("string").as("cs"),
      E.fromUnixTime(lit(3600L * 5 + 90)).cast("string").as("fut"),
      E.makeDatetime(lit(2024), lit(3), lit(5), lit(4), lit(30), lit(1.5))
        .cast("string").as("mk"),
      E.parseDateTime(col("s"), "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .cast("string").as("parsed"),
      E.addMinutes(col("ts"), lit(90)).cast("string").as("p90"),
      E.addDays(col("ts"), lit(30)).as("p30d"),
      E.unixTimestampE(col("ts")).as("epoch")))
  }

  test("*Local variants honor the EXPLICIT zone argument, not the session") {
    assertInvariant(civil.select(col("s"),
      E.hourLocal(col("ts"), "+05:30").as("h_ist"),
      E.minuteLocal(col("ts"), "+05:30").as("mi_ist"),
      E.dayLocal(col("ts"), "America/Los_Angeles").as("d_la"),
      E.hourLocal(col("ts"), "America/Los_Angeles").as("h_la"),
      E.yearLocal(col("ts"), "+05:30").as("y_ist"),
      E.dateFormatLocal(col("ts"), "yyyy-MM-dd HH:mm", "+05:30").as("f_ist")))
    // the explicit zone really is applied: 00:00 UTC reads 05:30 in IST
    val h = Seq("2024-01-01 00:00:00").toDF("s")
      .select(E.hourLocal(to_timestamp_ntz(col("s")), "+05:30")).as[Int].head()
    assert(h == 5)
  }

  test("duration windows (hopping) align identically under any session zone") {
    assertInvariant(civil
      .select(window(col("ts"), "10 minutes", "3 minutes").as("w"))
      .select(col("w.start").cast("string"), col("w.end").cast("string"))
      .orderBy("w"))
  }

  test("table loads keep civil timestamps: epoch of events.ts is zone-free") {
    assertInvariant(
      graft.Tables.events(spark, sf("sf0.001"))
        .select(col("event_id"), E.epochMicrosCivil(col("ts")).as("us"))
        .orderBy("event_id").limit(50))
  }
}
