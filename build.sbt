ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdc_auditspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver parses the LAST stdout line as JSON. Two sbt
// behaviors break that: the "[success] Total time..." trailer printed
// after the program exits, and the "[info] " prefix the default logger
// puts on forked-process stdout. Kill both: no success banner, and
// route forked stdout/stderr straight through un-prefixed.
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
// showSuccess is read by the command engine, not a task — lint can't see that
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap default is sized to the host — min(16 GiB, half of physical RAM),
// floor 2 GiB — so runMain JVMs start on any machine (a hard-coded
// -Xms16g + AlwaysPreTouch refuses to boot, and pre-commits 16 GiB even
// for quick smoke runs, on hosts smaller than this one). On the 128 GiB
// bench host this resolves to the full 16 GiB. SPARK_DRIVER_MEM overrides.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val hostGiB =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize >> 30
    catch { case _: Throwable => 16L }
  s"${math.max(2L, math.min(16L, hostGiB / 2))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g (host permitting): on an 8g heap, one full GC mid-bench lands a
  // 5-15s pause on a random query (observed q_embed_quantize 2.4s ->
  // 10.1s); the larger heap trades nothing visible for outlier-free runs
  s"-Xmx$driverHeap",
  // dozens of whole-stage-codegen'd queries in one session overflow the
  // default 240 MB JIT code cache; once it fills, HotSpot stops
  // compiling and random later queries drop to interpreted speed (5x
  // swings between identical bench runs). Size it for the query count.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("GRAFT_CODE_CACHE", "1g")}",
)
// Bench-stability extras for `runMain` JVMs ONLY (Bench/Verify/Smoke):
// tests must not pre-commit 16 GiB each on whatever host runs them.
run / javaOptions ++= Seq(
  // Xms = Xmx + AlwaysPreTouch: commit and fault-in the whole heap at
  // JVM start (before any query is timed) instead of growing it under
  // load — heap-expansion page faults and the G1 region re-size pauses
  // they trigger otherwise land on arbitrary mid-bench queries (the
  // recorded-run spikes on unchanged pure projections: 1.9s -> 12.2s).
  s"-Xms$driverHeap",
  "-XX:+AlwaysPreTouch",
  // GC log (single file per run, no rotation, gitignored): the
  // evidence that separates a plan regression from a collector pause
  // when a bench query spikes with unchanged code.
  "-Xlog:gc*:file=bench_gc.log::filecount=0",
)
