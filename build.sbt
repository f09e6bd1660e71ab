ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "minflinkspark"
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
// The bench driver parses the LAST stdout line of `sbt runMain
// graft.Bench` as bare JSON. sbt's default forked-run output strategy
// prefixes every child line with "[info] " and appends a
// "[success] Total time ..." banner, both of which defeated that parse
// for four rounds (BENCH_r05..r08 all "parsed": null). StdoutOutput
// passes the child's stdout/stderr through verbatim (no prefix), and
// showSuccess := false drops the trailing banner, so the child's final
// println IS the final stdout line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // a 180+-query single-JVM sweep generates thousands of whole-stage
  // codegen classes; the JDK17 default 240m code cache is sized for
  // far smaller programs. Headroom so compiled methods are never
  // flushed mid-sweep (A/B'd total-neutral at today's ledger size —
  // this is insurance for sweep growth, not a measured win).
  "-XX:ReservedCodeCacheSize=512m",
)
