package graft

import org.apache.spark.sql.SparkSession

/** Session construction shared by the Verify main and the cross-master
  * probe: one place that knows how to stand up a session on plain
  * `local[*]` AND on `local-cluster[...]`, where executors are forked as
  * SEPARATE JVMs — every broadcast, task closure, and custom-Expression
  * capture then crosses a real serialization wire, the one failure class
  * single-JVM local mode structurally cannot catch. Forked executors need
  * the driver's classpath (absolutized — they run in the worker's own
  * work dir, where relative entries silently vanish and Janino fails
  * codegen with "Unknown variable or type" on the first custom
  * Expression) and the JDK-17 --add-opens flags (spark-submit would
  * inject them; a bare main must do it itself — the list matches
  * org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()).
  */
object Sessions {

  val Jdk17AddOpensPackages: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  /** `--add-opens a=ALL-UNNAMED --add-opens b=ALL-UNNAMED ...` as one
    * string (executor extraJavaOptions) */
  def addOpensFlags: String =
    Jdk17AddOpensPackages.map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** The same flags as an argv fragment (forking a driver JVM). */
  def addOpensArgv: Seq[String] =
    Jdk17AddOpensPackages.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** This JVM's classpath with every entry absolutized — what forked
    * executor JVMs must see. */
  def absoluteClassPath: String =
    sys.props("java.class.path")
      .split(java.io.File.pathSeparator)
      .map(e => new java.io.File(e).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)

  /** Build a session on `master` with the graft semantic pins; wires the
    * executor classpath/add-opens/memory when `master` is local-cluster. */
  def build(master: String,
            shufflePartitions: String,
            tz: String = "UTC",
            ansi: String = "false",
            aqe: String = "true",
            speculation: Boolean = false,
            executorMem: String = "3g",
            appName: String = "graft"): SparkSession = {
    val b0 = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", tz)
      .config("spark.sql.ansi.enabled", ansi)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.speculation", speculation.toString)
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.ui.enabled", "false")
    val b =
      if (master.startsWith("local-cluster"))
        b0.config("spark.executor.extraClassPath", absoluteClassPath)
          .config("spark.executor.extraJavaOptions", addOpensFlags)
          .config("spark.executor.memory", executorMem)
      else b0
    b.getOrCreate()
  }
}
