ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "big_data_lab_threespark"
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
// Pass the forked JVM's stdout through verbatim: the bench/verify
// drivers json.loads stdout lines, and sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 8g was measurably too tight for the 129-query bench run on
  // local[32]: steady-state GC pressure inflated mid-run queries 6-12×
  // vs isolated runs (e.g. q_f13_json_nested 8.3s in-run vs 0.7s alone).
  // The box has 128 GiB; give the single-JVM "cluster" a realistic heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // diagnostics hook: GRAFT_EXTRA_JVM_OPTS="-Xlog:gc" sbt "runMain ..."
  // (e.g. GC logging when a bench sweep shows unexplained stalls).
  // Whitespace-split: an individual option must not contain spaces
  // (quoted or not) — point file-valued options at space-free paths.
  sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+"))
