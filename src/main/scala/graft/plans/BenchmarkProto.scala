package graft.plans

import graft.OperatorStat

/** The reference's per-cursor benchmark record, `BenchmarkData`
  * (`benchmark/proto/benchmark.proto:11-74`), as an exact proto2 wire
  * codec plus the DOT rendering (`benchmark/dot/dot_drawer.cc:208-284`)
  * over graft's [[graft.Instrument]] plan statistics.
  *
  * `cursor_type` enum: BENCHMARKED = 0, NOT_BENCHMARKED = 1,
  * UNRECOGNISED = 2 (`benchmark.proto:12-16`). All temporal values are
  * MICROSECONDS; `relative_time` and `return_rate` are PERCENTAGES
  * 0..100 (`cursor_statistics.cc:30-40` — CalculateRate multiplies by
  * 100 for those two, not for the row rates).
  */
final case class BenchmarkData(
    cursorName: String,
    cursorType: Int,
    totalSubtreeTime: Option[Long] = None,
    processingTime: Option[Long] = None,
    rowsProcessed: Option[Long] = None,
    nextCalls: Option[Long] = None,
    relativeTime: Option[Double] = None,
    throughput: Option[Double] = None,
    returnRate: Option[Double] = None,
    rowProcessingRate: Option[Double] = None,
    preprocessingTime: Option[Long] = None,
    indexSetUpTime: Option[Long] = None,
    matchingTime: Option[Long] = None,
    speedUp: Option[Double] = None)

object BenchmarkData {
  val BENCHMARKED = 0
  val NOT_BENCHMARKED = 1
  val UNRECOGNISED = 2
}

object BenchmarkProto {

  /** Exact proto2 bytes for one BenchmarkData message, fields emitted in
    * field-number order (the canonical serializer layout). */
  def encode(d: BenchmarkData): Array[Byte] = {
    val w = new ProtoWire.Writer
    w.stringField(1, d.cursorName)
    w.varintField(2, d.cursorType.toLong)
    d.totalSubtreeTime.foreach(v => w.varintField(3, v))
    d.processingTime.foreach(v => w.varintField(4, v))
    d.rowsProcessed.foreach(v => w.varintField(5, v))
    d.nextCalls.foreach(v => w.varintField(6, v))
    d.relativeTime.foreach(v => w.doubleField(7, v))
    d.throughput.foreach(v => w.doubleField(8, v))
    d.returnRate.foreach(v => w.doubleField(9, v))
    d.rowProcessingRate.foreach(v => w.doubleField(10, v))
    d.preprocessingTime.foreach(v => w.varintField(11, v))
    d.indexSetUpTime.foreach(v => w.varintField(12, v))
    d.matchingTime.foreach(v => w.varintField(13, v))
    d.speedUp.foreach(v => w.doubleField(14, v))
    w.bytes
  }

  def decode(bytes: Array[Byte]): BenchmarkData = {
    val r = new ProtoWire.Reader(bytes)
    var d = BenchmarkData("", BenchmarkData.UNRECOGNISED)
    var sawName = false
    var sawType = false
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 2) => d = d.copy(cursorName = r.readString()); sawName = true
        case (2, 0) => d = d.copy(cursorType = r.readVarint().toInt); sawType = true
        case (3, 0) => d = d.copy(totalSubtreeTime = Some(r.readVarint()))
        case (4, 0) => d = d.copy(processingTime = Some(r.readVarint()))
        case (5, 0) => d = d.copy(rowsProcessed = Some(r.readVarint()))
        case (6, 0) => d = d.copy(nextCalls = Some(r.readVarint()))
        case (7, 1) => d = d.copy(relativeTime = Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
        case (8, 1) => d = d.copy(throughput = Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
        case (9, 1) => d = d.copy(returnRate = Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
        case (10, 1) => d = d.copy(rowProcessingRate = Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
        case (11, 0) => d = d.copy(preprocessingTime = Some(r.readVarint()))
        case (12, 0) => d = d.copy(indexSetUpTime = Some(r.readVarint()))
        case (13, 0) => d = d.copy(matchingTime = Some(r.readVarint()))
        case (14, 1) => d = d.copy(speedUp = Some(java.lang.Double.longBitsToDouble(r.readFixed64())))
        case (_, wt) => r.skip(wt)
      }
    }
    require(sawName && sawType,
      "BenchmarkData: missing required cursor_name/cursor_type (proto2 required fields)")
    d
  }

  /** One BenchmarkData per instrumented plan node. A node with neither a
    * timing metric nor a row count maps to NOT_BENCHMARKED — the
    * reference's "transparent" cursors the drawer skips. The plan total
    * (sum of instrumented node times — Instrument's documented
    * relative-time base) rides on the ROOT message's total_subtree_time,
    * which is the one field DrawGlobalStats reads. */
  def fromStats(stats: Seq[OperatorStat]): Seq[BenchmarkData] = {
    val total = stats.flatMap(_.processingTimeUs).sum
    stats.map { s =>
      val benchmarked = s.processingTimeUs.isDefined || s.rowsProcessed.isDefined
      BenchmarkData(
        cursorName = s.operator,
        cursorType = if (benchmarked) BenchmarkData.BENCHMARKED
                     else BenchmarkData.NOT_BENCHMARKED,
        totalSubtreeTime = if (s.parentId < 0) Some(total) else None,
        processingTime = s.processingTimeUs,
        rowsProcessed = s.rowsProcessed,
        relativeTime = s.relativeTime.map(_ * 100.0),
        throughput = s.throughput,
        returnRate = s.returnRate.map(_ * 100.0),
        rowProcessingRate = s.rowProcessingRate)
    }
  }
}

/** DOT rendering of a benchmark tree — a line-for-line Scala port of the
  * drawing rules in `dot_drawer.cc` (node shapes 51-63, human-readable
  * number/time/percent formats 66-99 following
  * `utils/strings/human_readable.cc:227-254`, node/table markup 103-135,
  * parameter population 140-222, graph skeleton 248-321). */
object BenchmarkDot {

  val GraphName = "SupersonicBenchmarkGraph"
  val RootNodeName = "Root"
  val GlobalStatsNodeName = "GlobalStats"

  private val LeafNode = 0
  private val RegularNode = 1
  private val RootNode = 2

  private def shape(t: Int): String = t match {
    case LeafNode => "folder"
    case RegularNode => "box"
    case RootNode => "point"
  }

  /** HumanReadableNum::DoubleToString: 3/2/1/0 fraction digits by
    * magnitude band, then k/M/B/T compaction, %.3G past 1e15. */
  // The reference formats with C-locale StringPrintf; the f"" interpolator
  // is default-locale-sensitive (decimal commas under e.g. de_DE), so all
  // numeric rendering pins Locale.ROOT.
  private def fmtRoot(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[AnyRef]): _*)

  def compact(value0: Double): String = {
    val neg = value0 < 0
    val value = math.abs(value0)
    val s =
      if (value < 1.0) fmtRoot("%.3f", value)
      else if (value < 10) fmtRoot("%.2f", value)
      else if (value < 1e2) fmtRoot("%.1f", value)
      else if (value < 1e3) fmtRoot("%.0f", value)
      else if (value >= 1e15) fmtRoot("%.3G", value)
      else {
        val units = "kMBT"
        var v = value
        var u = 0
        while (v >= 1e6) { v /= 1e3; u += 1 }
        fmtRoot("%.2f", v / 1000.0) + units.charAt(u)
      }
    if (neg) "-" + s else s
  }

  def readableRowRate(rowsPerMicro: Double): String =
    compact(rowsPerMicro * 1000000L) + " rows/s"

  def readableTime(micros: Long): String =
    if (micros > 1000000L) compact(micros.toDouble / 1000000L) + " s"
    else if (micros > 1000L) compact(micros.toDouble / 1000L) + " ms"
    else s"$micros us"

  def readablePercentage(value: Double): String = fmtRoot("%.2f", value) + "%"

  /** DOT node IDs minted from Spark nodeName + counter contain spaces and
    * parens ('Scan parquet3', 'WholeStageCodegen (1)0') — invalid as bare
    * DOT IDs, so every ID is emitted as a quoted string. */
  private def quoteId(id: String): String =
    "\"" + id.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def codeForNode(cursorName: String, params: Seq[String],
                          tpe: Int, description: String): String = {
    val tableDelim = "</td></tr><tr><td align=\"right\">"
    val tableStart = "<table border=\"0\" align=\"right\" cellpadding=\"0\">"
    val label = (if (description.isEmpty) cursorName else description) +
      tableDelim + params.mkString(tableDelim)
    s"""${quoteId(cursorName)} [shape=${shape(tpe)}, label=<$tableStart<tr><td bgcolor="grey">$label</td></tr></table>>]"""
  }

  private def codeForEdge(from: String, to: String, params: Seq[String]): String =
    s"""${quoteId(from)}->${quoteId(to)} [label="${params.mkString("\\n")}"];"""

  /** dot_drawer.cc:140-201 — parameter rows, in the reference's order;
    * returns (params, throughputAvailable). */
  private def nodeParams(d: BenchmarkData): (Seq[String], Boolean) = {
    if (d.cursorType == BenchmarkData.UNRECOGNISED)
      return (Seq("<font color=\"red\">unrecognised</font>"), false)
    val b = Seq.newBuilder[String]
    val rel = d.relativeTime.map(r => s" (${readablePercentage(r)})").getOrElse("")
    d.processingTime.foreach(t => b += readableTime(t) + rel)
    val throughputAvailable = d.processingTime.exists(_ > 0)
    d.nextCalls.foreach(n => b += s"Next() calls: $n")
    d.rowProcessingRate.foreach(r => b += s"row processing rate: ${readableRowRate(r)}")
    d.preprocessingTime.foreach(t => b += s"pre-process: ${readableTime(t)}")
    d.indexSetUpTime.foreach(t => b += s"index setup: ${readableTime(t)}")
    d.matchingTime.filter(_ > 0).foreach(t => b += s"matching: ${readableTime(t)}")
    d.returnRate.foreach(r => b += s"return rate: ${readablePercentage(r)}")
    d.speedUp.foreach(s => b += s"speed-up: ${compact(s)}")
    (b.result(), throughputAvailable)
  }

  /** dot_drawer.cc:205-222 */
  private def edgeParams(d: BenchmarkData, throughputAvailable: Boolean): Seq[String] = {
    if (d.cursorType == BenchmarkData.UNRECOGNISED) return Nil
    val b = Seq.newBuilder[String]
    d.rowsProcessed.foreach(r => b += s"$r rows total")
    if (throughputAvailable) d.throughput.foreach(t => b += s"(${readableRowRate(t)})")
    b.result()
  }

  /** Full DOT document for an instrumented plan: graph skeleton, the
    * GlobalStats box (total wall from the root message), the Root point
    * node, then the benchmark tree — NOT_BENCHMARKED nodes are
    * transparent (skipped; their children attach to the nearest drawn
    * ancestor), node names are cursor_name + running counter, edges run
    * child -> parent (rankdir=BT). */
  def draw(stats: Seq[OperatorStat], benchmarkName: String): String = {
    val data = BenchmarkProto.fromStats(stats)
    val children: Map[Int, Seq[Int]] =
      stats.indices.groupBy(i => stats(i).parentId).map {
        case (p, is) => p -> is.sortBy(identity)
      }
    val out = new StringBuilder
    def line(s: String): Unit = { out.append(s).append('\n') }
    line(s"digraph $GraphName {")
    line("center=true;")
    line("rankdir=BT;")
    line("node [color=black];")
    line("edge [minlen=2.5];")
    // global stats box (total time from the root message)
    val rootIdx = stats.indexWhere(_.parentId < 0)
    val totalUs = if (rootIdx < 0) 0L
      else data(rootIdx).totalSubtreeTime.getOrElse(0L)
    line(s"{rank=max; $GlobalStatsNodeName}")
    line(codeForNode(GlobalStatsNodeName,
      Seq(s"Total time: ${readableTime(totalUs)}"), RegularNode, benchmarkName))
    // root point node + benchmark subtree
    line(codeForNode(RootNodeName, Nil, RootNode, ""))
    var counter = 0
    def drawSubtree(idx: Int, parentName: String): Unit = {
      val d = data(idx)
      // the reference mints the numbered name BEFORE the draw check
      // (dot_drawer.cc:265), so skipped nodes still consume a counter slot
      val nodeName = s"${d.cursorName}$counter"
      counter += 1
      val drawNode = d.cursorType != BenchmarkData.NOT_BENCHMARKED
      if (drawNode) {
        val kids = children.getOrElse(stats(idx).nodeId, Nil)
        val (params, thr) = nodeParams(d)
        line(codeForNode(nodeName, params,
          if (kids.isEmpty) LeafNode else RegularNode, ""))
        line(codeForEdge(nodeName, parentName, edgeParams(d, thr)))
      }
      children.getOrElse(stats(idx).nodeId, Nil)
        .foreach(drawSubtree(_, if (drawNode) nodeName else parentName))
    }
    if (rootIdx >= 0) drawSubtree(rootIdx, RootNodeName)
    line("}")
    out.toString
  }
}
