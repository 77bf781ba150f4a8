ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "securitymasterspark"
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
// Forked-run stdout passes through unprefixed: Bench/Verify print
// machine-read JSON lines, and sbt's default "[info] " decoration
// breaks downstream json parsing of the bench output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and the bench JSON must be the LAST stdout line: sbt's
// "[success] Total time: …" trailer otherwise lands after it and the
// round-2 driver bench record came back parsed:null.
Global / showSuccess := false
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
  // 8g forced full GCs in the back half of the 87-query bench (every
  // query's hash/sort/broadcast state churns the same heap); the box
  // has 128 GiB — size the single-JVM "cluster" like one.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 87 queries × 2 passes of unique whole-stage-codegen classes blow
  // through the default 240 MB code cache, after which the JIT stops
  // compiling and the tail of the run executes interpreted (~2× slower).
  "-XX:ReservedCodeCacheSize=512m",
)
