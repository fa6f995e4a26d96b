ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "maggmaspark"
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
// Bench↔driver stdout contract: the forked JVM's stdout must pass through
// UNPREFIXED (sbt's default LoggedOutput wraps every line in "[info] ",
// which made the bench's one-line JSON unparseable to the driver in rounds
// 1-16 — every BENCH_r*.json has parsed:null), and nothing may follow it
// (the "[success] Total time ..." banner otherwise becomes the last line).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task — the
// unused-key lint is a false positive (the [success] banner does go away)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 64g default on the 128 GiB bench host: the full suite at sf1 holds
  // ~90 queries of accumulated JVM state, and the heaviest sketch query
  // measured 5x in-suite GC inflation under 32g (isolated 37 s -> 196 s
  // in-suite; heap is not reserved up front, so small runs are unaffected)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
) ++ sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
