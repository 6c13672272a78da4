ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "insectobservationdatapipelinespark"
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
// Pass the forked run's stdout through UNPREFIXED (VERDICT r14 #1 /
// every round's "parsed: null"): sbt's default LoggedOutput strategy
// prefixes each forked-process line with "[info] ", so the one-line JSON
// artifact contract Bench prints ("{"metric":...}" as the last stdout
// line) was never machine-parseable in any driver artifact — every
// BENCH_r*.json carries "parsed": null. StdoutOutput hands the child's
// stdout/stderr straight through, so the bench summary line reaches the
// driver's tail capture as raw JSON.
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
  // 16g, not 8g: at 185 bench legs the accumulated driver-side state
  // (broadcasts, codegen classes, cached-plan debris) tips an 8g heap
  // into GC thrash by the post-query tail — the bench's own calibration
  // leg measured end-of-run 2x degradation (spread 2.03) that vanishes
  // at 16g (spread 1.13, end==mid). Box has 128 GiB; override with
  // SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
