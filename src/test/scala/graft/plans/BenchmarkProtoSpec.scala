package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.OperatorStat

/** Golden-byte and DOT-snapshot specs for the reference benchmark faces:
  * BenchmarkData proto2 wire (`benchmark/proto/benchmark.proto:11-74`)
  * and the DOT tree rendering (`benchmark/dot/dot_drawer.cc`). Expected
  * bytes are HAND-ASSEMBLED from the proto2 wire spec — the encoder is
  * pinned to the format, not to itself. */
class BenchmarkProtoSpec extends AnyFunSuite {

  test("encode: golden bytes hand-assembled from the proto2 wire spec") {
    val d = BenchmarkData(
      cursorName = "HashJoin",
      cursorType = BenchmarkData.BENCHMARKED,
      processingTime = Some(1500L),
      rowsProcessed = Some(300L),
      relativeTime = Some(12.5),
      throughput = Some(0.2))
    def le64(v: Double): Seq[Int] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toInt)
    }
    val expected: Seq[Int] =
      Seq(0x0a, 8) ++ "HashJoin".getBytes("UTF-8").map(_.toInt) ++ // 1: string
      Seq(0x10, 0x00) ++                    // 2: cursor_type = BENCHMARKED(0)
      Seq(0x20, 0xdc, 0x0b) ++              // 4: processing_time = 1500
      Seq(0x28, 0xac, 0x02) ++              // 5: rows_processed = 300
      (Seq(0x39) ++ le64(12.5)) ++          // 7: relative_time (fixed64)
      (Seq(0x41) ++ le64(0.2))              // 8: throughput (fixed64)
    assert(BenchmarkProto.encode(d).map(_ & 0xff).toSeq == expected)
  }

  test("decode: round-trips every field; rejects missing required fields") {
    val full = BenchmarkData("Sort", BenchmarkData.NOT_BENCHMARKED,
      totalSubtreeTime = Some(99L), processingTime = Some(5L),
      rowsProcessed = Some(7L), nextCalls = Some(3L),
      relativeTime = Some(1.25), throughput = Some(0.5),
      returnRate = Some(100.0), rowProcessingRate = Some(2.5),
      preprocessingTime = Some(11L), indexSetUpTime = Some(13L),
      matchingTime = Some(17L), speedUp = Some(1.9))
    assert(BenchmarkProto.decode(BenchmarkProto.encode(full)) == full)
    // required cursor_name / cursor_type (proto2) enforced on read
    val noType = { val w = new ProtoWire.Writer; w.stringField(1, "X"); w.bytes }
    assertThrows[IllegalArgumentException](BenchmarkProto.decode(noType))
  }

  test("human-readable formats match human_readable.cc / dot_drawer.cc") {
    assert(BenchmarkDot.compact(0.5) == "0.500")      // < 1: three digits
    assert(BenchmarkDot.compact(5.25) == "5.25")      // < 10: two digits
    assert(BenchmarkDot.compact(55.54) == "55.5")     // < 100: one digit
    assert(BenchmarkDot.compact(555.4) == "555")      // < 1000: none
    assert(BenchmarkDot.compact(5555.0) == "5.56k")   // k/M/B/T compaction
    assert(BenchmarkDot.compact(2500000.0) == "2.50M")
    assert(BenchmarkDot.compact(-5.25) == "-5.25")
    assert(BenchmarkDot.readableTime(500L) == "500 us")
    assert(BenchmarkDot.readableTime(5000L) == "5.00 ms")
    assert(BenchmarkDot.readableTime(2500000L) == "2.50 s")
    assert(BenchmarkDot.readableRowRate(0.5) == "500.00k rows/s")
    assert(BenchmarkDot.readablePercentage(12.5) == "12.50%")
  }

  // a 4-node plan: root agg <- exchange <- project (uninstrumented,
  // transparent) <- scan
  private val stats = Seq(
    OperatorStat(0, -1, 0, "HashAggregate", Some(10L), Some(2000L),
      Some(0.005), Some(0.1), Some(0.05), Some(0.5)),
    OperatorStat(1, 0, 1, "Exchange", Some(100L), Some(2000L),
      Some(0.05), Some(1.0), Some(0.05), Some(0.5)),
    OperatorStat(2, 1, 2, "Project", None, None, None, None, None, None),
    OperatorStat(3, 2, 3, "Scan parquet", Some(100L), None,
      None, None, None, None))

  test("fromStats: cursor types, percent scaling, root-only subtree total") {
    val data = BenchmarkProto.fromStats(stats)
    assert(data.map(_.cursorType) == Seq(0, 0, 1, 0))
    assert(data.head.totalSubtreeTime.contains(4000L)) // 2000 + 2000
    assert(data(1).totalSubtreeTime.isEmpty)
    assert(data.head.relativeTime.contains(50.0))      // 0.5 -> percent
    assert(data(1).returnRate.contains(100.0))         // 1.0 -> percent
  }

  test("DOT document matches dot_drawer.cc line for line") {
    // Node IDs are quoted: names minted from Spark nodeName + counter
    // ('Scan parquet3', 'WholeStageCodegen (1)0') are invalid as bare DOT
    // IDs, so the drawer emits every ID as a quoted string.
    val dot = BenchmarkDot.draw(stats, "bench-x")
    val expected =
      """digraph SupersonicBenchmarkGraph {
        |center=true;
        |rankdir=BT;
        |node [color=black];
        |edge [minlen=2.5];
        |{rank=max; GlobalStats}
        |"GlobalStats" [shape=box, label=<<table border="0" align="right" cellpadding="0"><tr><td bgcolor="grey">bench-x</td></tr><tr><td align="right">Total time: 4.00 ms</td></tr></table>>]
        |"Root" [shape=point, label=<<table border="0" align="right" cellpadding="0"><tr><td bgcolor="grey">Root</td></tr><tr><td align="right"></td></tr></table>>]
        |"HashAggregate0" [shape=box, label=<<table border="0" align="right" cellpadding="0"><tr><td bgcolor="grey">HashAggregate0</td></tr><tr><td align="right">2.00 ms (50.00%)</td></tr><tr><td align="right">row processing rate: 50.00k rows/s</td></tr><tr><td align="right">return rate: 10.00%</td></tr></table>>]
        |"HashAggregate0"->"Root" [label="10 rows total\n(5.00k rows/s)"];
        |"Exchange1" [shape=box, label=<<table border="0" align="right" cellpadding="0"><tr><td bgcolor="grey">Exchange1</td></tr><tr><td align="right">2.00 ms (50.00%)</td></tr><tr><td align="right">row processing rate: 50.00k rows/s</td></tr><tr><td align="right">return rate: 100.00%</td></tr></table>>]
        |"Exchange1"->"HashAggregate0" [label="100 rows total\n(50.00k rows/s)"];
        |"Scan parquet3" [shape=folder, label=<<table border="0" align="right" cellpadding="0"><tr><td bgcolor="grey">Scan parquet3</td></tr><tr><td align="right"></td></tr></table>>]
        |"Scan parquet3"->"Exchange1" [label="100 rows total"];
        |}
        |""".stripMargin
    assert(dot == expected)
  }

  test("DOT node-ID quoting escapes quotes and backslashes") {
    val s = Seq(
      OperatorStat(1, -1, 0, """Weird "name"\x""", Some(10L), Some(1000L),
        Some(0.01), Some(0.5), Some(0.01), Some(1.0)))
    val dot = BenchmarkDot.draw(s, "b")
    assert(dot.contains("\"Weird \\\"name\\\"\\\\x0\""))
  }
}
