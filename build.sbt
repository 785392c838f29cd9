ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "djangoadmin_postgresql_2_elasticseachspark"
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
// Forked `runMain` output goes STRAIGHT to the console instead of through
// sbt's logger: graft.Bench's one-line JSON contract must reach the driver's
// stdout parser bare — the default LoggedOutput prefixes every line with
// "[info] ", which is what left BENCH_r07 "parsed": null even after the
// line itself was shrunk to fit the driver's tail buffer.
run / outputStrategy := Some(StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line: the driver's
// stdout parser keeps only the last 2000 chars, and that line would push
// 73 chars of graft.Bench's one-line JSON contract out of the window.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Codegen emits one class per WholeStageCodegen span; an 80-query bench
  // in one JVM can brush the 240m JDK17 default, and a full code cache
  // silently disables C2 — the interpreted object-agg paths
  // (collect_set/sort_array) then run ~20x slow with no error anywhere.
  "-XX:ReservedCodeCacheSize=512m",
)
