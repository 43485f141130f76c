ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "warcraiderspark"
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
// The driver parses the LAST ~2 KB of `sbt runMain graft.Bench` stdout as
// a JSON headline. Two things have broken that parse three rounds running:
// the forked run's output is routed through sbt's logger (every line gets
// an "[info] " prefix), and sbt appends its own "[success] Total time..."
// line AFTER the JSON. Route forked output straight to stdout and drop the
// success banner so the headline is the final unprefixed line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// the unscoped outputStrategy set trips sbt's unused-key lint even though
// the forked-run scope delegates to it
Global / excludeLintKeys += outputStrategy
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
  // 32 concurrent local tasks thrash GC in a small heap (observed: the
  // same query 8s solo vs 60s late in a 55-query bench run at 8g); the
  // box has 128 GiB — give the single-JVM driver+executors real room
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
