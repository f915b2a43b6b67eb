ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "damg7245casestudy03ai_scoring_enginespark"
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
// The driver parses the LAST stdout line of `runMain graft.Bench` as JSON;
// sbt's "[success] Total time: …" trailer has made that parse fail (null)
// in all seven rounds. Suppress it so the bench JSON is the final line,
// and pass the forked JVM's stdout through RAW (StdoutOutput) instead of
// via sbt's logger, which prefixes every line with "[info] ".
Global / showSuccess := false
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 240-query sweep compiles thousands of whole-stage-codegen classes
  // in one JVM; near-full JIT code cache degrades silently (continuous
  // sweeper churn, compile stalls — round-12 boxed-kill thread dumps
  // showed 6+ executor threads queued on GeneratedClass.generate while
  // cheap queries ran 10× slow). Default is 240 MB; give it room.
  "-XX:ReservedCodeCacheSize=512m",
)
