ThisBuild / scalaVersion := "2.13.17"
// The driver parses the FINAL stdout line of `sbt "runMain graft.Bench"`
// as the bench JSON. sbt's "[success] Total time: ..." footer prints
// after the program's output, so it — not the JSON — was the last line
// (BENCH_r01..r03 all came back "parsed": null). Suppress it globally.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// With fork:=true sbt relays the child's stdout through its logger,
// prefixing every line with "[info] ". Inherit the parent's stdout
// instead so the bench JSON line is emitted verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / version := "0.1.0"
name := "agrimarketdatapipelinespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Harness log hygiene: Spark only applies its log4j2-defaults when the
  // context is unconfigured, so pointing the forked JVMs at our mirror
  // (root WARN + the known-unavoidable streaming/NativeCodeLoader
  // warners muted to ERROR) makes the bench/verify tail empty-by-default
  // — any WARN that still appears is a new signal. Harness-only: library
  // consumers of the jar keep Spark's stock logging.
  s"-Dlog4j2.configurationFile=${(file("conf") / "log4j2-harness.properties").getAbsoluteFile.toURI}",
)
