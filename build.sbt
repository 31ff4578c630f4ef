ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "snowflake_to_bq_pipelinespark"
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
// The bench/verify contract is "summary JSON is the LAST stdout line"; sbt's
// "[success] Total time: …" epilogue trailed it for four rounds and broke the
// driver's tail parse. Suppress it (errors still surface via exit code).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked run output goes through sbt's logger by default, prefixing every
// line with "[info] " — which would still defeat a strict JSON parse of the
// bench summary line. Inherit sbt's raw stdout/stderr instead.
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
  // local[32] runs driver + all executor threads in ONE JVM: 8g starved the
  // 32-way shuffles at sf0.1 once checkpoint blocks accumulated (the box has
  // 128 GiB; a real cluster would give each executor its own heap). 24g
  // still showed 39 s G1 spikes inside single bench stages (PERF_NOTES.md);
  // 32g gives G1 the slack to keep collections off the measured path.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
