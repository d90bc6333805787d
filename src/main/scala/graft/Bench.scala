package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}. The reference analog is the cursor
  * benchmark framework (benchmark/proto/benchmark.proto:23-60) — here the
  * unit of measurement is a whole query plan, wall-clock.
  *
  * Timing methodology (round 5): per-query BEST-OF-K (K=3, or 2 once the
  * first run reaches 4 s), with `spark.catalog.clearCache()` +
  * `System.gc()` run UNTIMED between attempts. Rationale: all ~90 queries
  * share one JVM, so GC debt, page-cache churn and codegen-cache growth
  * from a heavy query land on whichever query runs next — the round-3/4
  * driver benches showed sub-second codegen'd projections reading 2-3x
  * their isolated cost from exactly this (BASELINE.md drift
  * investigations). Best-of-K measures the query, not its neighbors;
  * clearCache prevents the opposite error (a later rep reusing a cached
  * frame from an earlier rep and reading artificially fast).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: one untimed run to absorb JVM/codegen/parquet-footer startup
    // so the first timed query isn't charged ~8s of session warmup.
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink: full plan executes (no count()-driven column pruning).
    // Optional args filter to the named queries (local A/B timing).
    val only = args.toSet
    val picked =
      if (only.isEmpty) SparkEntry.queries.toSeq else SparkEntry.queries.filter(kv => only(kv._1)).toSeq

    // One timed execution; -1 marks failure so the JSON is unambiguous.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 name: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1.0 }
    }
    // Untimed inter-attempt reset: drop cached frames (no cross-rep cache
    // reuse) and pay accumulated GC debt here instead of inside the next
    // timed window.
    def reset(): Unit = { spark.catalog.clearCache(); System.gc() }

    // Per-query JSONL record, streamed AS EACH QUERY COMPLETES (flushed
    // line-by-line): the one-line suite JSON outgrew the driver's captured
    // stdout tail at ~330 queries (BENCH_r07.json "parsed": null), and a
    // single end-of-run artifact also loses everything on a mid-suite
    // crash. This file can lose at most the in-flight query.
    val jsonlPath =
      if (only.isEmpty) "BENCH_LAST.jsonl" else "BENCH_FILTERED_LAST.jsonl"
    val jsonl =
      try Some(new java.io.PrintWriter(new java.io.FileWriter(jsonlPath)))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $jsonlPath: $e"); None }

    val results = picked.sortBy(_._1).map { case (name, fn) =>
      // Declared one-time ingest (bucketed-table writes) runs UNTIMED:
      // the query's baseline row times the query, not its load phase.
      SparkEntry.benchSetup.get(name).foreach { setup =>
        try setup(spark, sfDir)
        catch { case e: Throwable => System.err.println(s"[bench] setup $name: $e") }
      }
      reset()
      val first = timeOnce(fn, name)
      val extra = if (first < 0) 0 else if (first >= 4.0) 1 else math.max(0, reps - 1)
      val times = first +: (1 to extra).map { _ => reset(); timeOnce(fn, name) }
      val valid = times.filter(_ >= 0)
      val best = if (valid.isEmpty) -1.0 else valid.min
      jsonl.foreach { w =>
        w.println(s"""{"query":"$name","sec":$best,"sf":"$sfDir"}"""); w.flush()
      }
      name -> best
    }.toMap

    // ---- outlier re-verification (round 14 protocol, r16 revision): a
    // full-suite sf0.1 query landing over 2x its BASELINE_ROWS ledger
    // wall is most often same-session contention (GC debt, page-cache
    // churn from ~345 shared-JVM neighbors — the r4 and r13 false-alarm
    // classes), so each suspect gets THREE isolated attempts at the END
    // of the suite, after the churn, and the headline per-query value is
    // their MEDIAN. The r15 single-rerun policy was one-sample noisy in
    // both directions (one anomalous end-of-suite rerun set the headline
    // unboundedly); min(first, rerun) before it was biased toward pass
    // conditioned on gate failure. The median of three independent
    // uncontended measurements is robust to a single bad sample and
    // carries no directional bias; all samples are recorded ("reruns"
    // in the artifacts).
    val rerunInfo: Map[String, (Double, Double)] =
      if (only.nonEmpty || !sfDir.stripSuffix("/").endsWith("sf0.1")) Map.empty
      else {
        val baselines: Map[String, Double] =
          try {
            val om = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = om.readTree(new java.io.File("BASELINE_ROWS.json"))
            val it = root.fields()
            val b = Map.newBuilder[String, Double]
            while (it.hasNext) {
              val e = it.next()
              val v = e.getValue.get("sf0.1_s")
              if (v != null && v.isNumber) b += e.getKey -> v.asDouble
            }
            b.result()
          } catch { case e: Throwable =>
            System.err.println(s"[bench] BASELINE_ROWS.json: $e"); Map.empty }
        val suspects = results.toSeq.filter { case (n, v) =>
          v >= 0 && baselines.get(n).exists(b => b > 0 && v > 2 * b)
        }.sortBy(_._1)
        suspects.map { case (n, first) =>
          val again = (1 to 3).map { _ => reset(); timeOnce(SparkEntry.queries(n), n) }
          val ok = again.filter(_ >= 0).sorted
          val med = if (ok.isEmpty) -1.0 else ok(ok.size / 2)
          jsonl.foreach { w =>
            w.println(s"""{"query":"$n","sec":$med,"sf":"$sfDir","rerun":true,"""
              + s""""first_pass":$first,"samples":[${again.mkString(",")}]}"""); w.flush()
          }
          n -> (first, med)
        }.toMap
      }
    jsonl.foreach(_.close())
    val finalResults = results.map { case (n, v) =>
      rerunInfo.get(n) match {
        case Some((_, r)) if r >= 0 => n -> r
        case _ => n -> v
      }
    }
    val total = finalResults.values.filter(_ >= 0).sum
    val rerunsJson =
      if (rerunInfo.isEmpty) ""
      else rerunInfo.toSeq.sortBy(_._1).map { case (n, (f, r)) =>
        "\"" + n + "\":{\"first\":" + f"$f%.4f" + ",\"rerun\":" + f"$r%.4f" + "}"
      }.mkString(",\"reruns\":{", ",", "}")
    def line(fmt: Double => String): String = {
      val qs = finalResults.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$rerunsJson,"sf":"$sfDir"}"""
    }
    // stdout: the full line first (for consumers reading whole stdout),
    // then a COMPACT summary as the LAST line — the driver keeps only a
    // ~2000-char stdout tail, which decapitates the full 331-query line;
    // the summary (total, count, the slowest queries, pointers to the
    // full records) always fits and always parses.
    println(line(v => f"$v%.4f"))
    val lastPath = if (only.isEmpty) "BENCH_LAST.json" else "BENCH_FILTERED_LAST.json"
    try {
      val w = new java.io.PrintWriter(lastPath)
      try w.println(line(_.toString)) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] $lastPath: $e") }
    val top = finalResults.toSeq.sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$total%.4f"},"unit":"sec","n_queries":${finalResults.size},"n_failed":${finalResults.values.count(_ < 0)},"n_reruns":${rerunInfo.size},"queries":$top$rerunsJson,"queries_truncated":true,"queries_full":"$lastPath","queries_jsonl":"$jsonlPath","sf":"$sfDir"}""")
    // Optional per-operator stats dump (reference benchmark-framework
    // analog): SPARK_GRAFT_STATS=<path> re-runs each picked query UNTIMED
    // and writes one JSON line of per-node SQLMetric stats per query.
    sys.env.get("SPARK_GRAFT_STATS").foreach { path =>
      val w = new java.io.PrintWriter(path)
      try picked.sortBy(_._1).foreach { case (name, fn) =>
        try {
          Instrument.drainStreamStats() // discard progress left by timed runs
          w.println(Instrument.toJson(name, Instrument.stats(fn(spark, sfDir))))
          // streaming gates also publish per-batch rows/state progress —
          // one extra JSON line per streaming run inside the query
          Instrument.drainStreamStats().foreach { case (label, batches) =>
            w.println(Instrument.streamToJson(name, label, batches))
          }
        } catch { case e: Throwable => System.err.println(s"[stats] $name: $e") }
      } finally w.close()
      System.err.println(s"[stats] per-operator stats written to $path")
    }
    spark.stop()
  }
}
