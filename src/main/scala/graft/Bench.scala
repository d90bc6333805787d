package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val results = picked.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      // a failed query reports -1 so the JSON is unambiguous about failures
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Optional per-operator stats dump (reference benchmark-framework
    // analog): SPARK_GRAFT_STATS=<path> re-runs each picked query UNTIMED
    // and writes one JSON line of per-node SQLMetric stats per query.
    sys.env.get("SPARK_GRAFT_STATS").foreach { path =>
      val w = new java.io.PrintWriter(path)
      try picked.sortBy(_._1).foreach { case (name, fn) =>
        try w.println(Instrument.toJson(name, Instrument.stats(fn(spark, sfDir))))
        catch { case e: Throwable => System.err.println(s"[stats] $name: $e") }
      } finally w.close()
      System.err.println(s"[stats] per-operator stats written to $path")
    }
    spark.stop()
  }
}
