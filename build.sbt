ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedqueryenginespark"
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
// Emit the forked run's stdout RAW (no "[info] " logger prefix): the
// driver parses the Bench JSON line from captured stdout, and the sbt
// logger prefix breaks a strict json parse of that line. The r3 bench
// tail proved the run-scoped setting alone does NOT apply to `runMain`
// (the JSON line still carried "[info] "), so set it unscoped too —
// the task-axis fallback runMain's forkOptions actually read.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 446-query sweep generates thousands of whole-stage-codegen classes;
  // the JDK default 240 MB reserved code cache fills mid-sweep, the JIT
  // stops compiling, and every later query pays a 20-40% deopt tax (the
  // r5 headline regression pattern: shuffle-bearing queries slowed
  // uniformly while trivial ones held flat). Size the cache for the
  // sweep; 1 GB is reservation, not allocation.
  "-XX:ReservedCodeCacheSize=1g",
)
