ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fdblog2clickhousespark"
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
// Pass forked-run output through verbatim: the driver parses Bench's JSON
// line from stdout, and sbt's default logger would prefix it with "[info] "
// (BENCH_r01/r02 recorded parsed:null because of exactly that).
run / outputStrategy := Some(StdoutOutput)
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
  // JVM default zone too: java.sql.Timestamp.toString renders in it, so
  // tests asserting rendered timestamps need UTC like the session
  "-Duser.timezone=UTC",
  // 24g default on the 128 GiB target box: the 201-query suite at 8g
  // spent ~5% of wall time in GC (measured round 6, bench/DRIFT_r6.md).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The bench/verify suite runs 200+ queries (×2 passes) in ONE JVM:
  // each execution emits whole-stage-codegen classes, and the JDK-17
  // default 240 MB code cache fills partway through — the JIT then stops
  // compiling and late queries run partially interpreted, which shows up
  // as round-over-round "drift" as the suite grows. Headroom makes
  // query N's timing independent of how many queries ran before it.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
