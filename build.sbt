ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// Surface deprecations at every compile (they hid behind the bare
// "3 deprecations" summary until round 10; zero-warning policy since).
ThisBuild / scalacOptions += "-deprecation"
name := "bigbookapietlwithairflowandsnowflakespark"
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
// Forked output goes through sbt's logger by default, which prefixes
// every line with "[info] " — that breaks any consumer expecting the
// Bench/Verify JSON line verbatim on stdout. Pass it through raw.
outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] = one JVM doing the work of 32 executors; the box has
  // 128 GiB. 8g starves iterative cached workloads into recompute storms.
  // Xms = Xmx: ContextCleaner's periodic System.gc() (see Bench/Verify)
  // otherwise full-GC-compacts, G1 shrinks the heap to ~2 G, and the run
  // thrashes in it — observed as 14 full GCs × 6.5 s inside one bench.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  // ... and the explicit GC itself must be a concurrent cycle, not a
  // stop-the-world compaction (weak refs — what ContextCleaner feeds on —
  // are processed in the concurrent cycle's remark pause just the same).
  "-XX:+ExplicitGCInvokesConcurrent",
  // ~190 distinct queries × whole-stage codegen = thousands of JIT'd
  // generated classes. The JDK default ReservedCodeCacheSize (240m) fills
  // after ~100 queries and the resulting C2/sweeper flush-recompile storm
  // stalls late queries by 10-70× (threads parked, 15-20% sys time).
  // 1g keeps every compiled method resident for the whole run.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(
  _.split("\\s+").toSeq.filter(_.nonEmpty) // empty arg would eat the main class
)
