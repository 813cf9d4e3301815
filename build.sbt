ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergcachespark"
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
// Forked-run output goes straight to this process's stdout/stderr instead
// of sbt's logger, so the bench's final JSON line reaches the caller
// WITHOUT an "[info] " prefix (the driver json-parses the last line).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's "[success] Total time: …" epilogue so the bench's JSON
// line is the LITERAL LAST line of stdout (the driver parses the last
// line; with the epilogue the JSON was second-to-last → parsed:null).
Global / showSuccess := false
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
// Default heap: local[32] is a 32-executor cluster in ONE JVM, so the
// driver heap IS the cluster's execution+storage memory. 8g (the old
// default) on this 128 GiB box made tenured-GC pressure land on
// whichever battery query ran next (the r14/r15 in-battery tails:
// q_incr_neardup 0.97 s isolated vs 10.08 s in-battery). 32g keeps the
// battery inside the isolated envelope; SPARK_DRIVER_MEM still
// overrides for memory-constrained hosts.
// -Xms = -Xmx: without it the r17 per-query GC quiesce (Bench/ScaleGate)
// let G1's full collections SHRINK the committed heap, and the next
// query paid page re-commit inside its timed region (measured: the gate
// base battery grew 54 s → 76 s when quiesce landed without this). A
// pinned heap keeps the quiesce cost outside the timer, which is the
// whole point of quiescing.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
