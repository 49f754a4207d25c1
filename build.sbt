ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rabitqspark"
// keep deprecation sites visible so real warnings don't hide in noise
// (the build is warning-clean as of round 13)
ThisBuild / scalacOptions += "-deprecation"
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
// Pass the forked JVM's stdout straight through instead of routing it via
// sbt's logger: the bench/verify mains print one machine-readable JSON line
// and the default LoggedOutput prefixes every line with "[info] ", which
// breaks downstream parsers (BENCH_r01/r02 both recorded parsed:null).
ThisBuild / outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's "[success] Total time: ..." trailer so the bench
// JSON line is the LAST thing on stdout: the bench consumer keeps only the
// final ~2000 chars (BENCH_r03 captured a tail that starts mid-line).
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint (it works; the earlier bench run confirms)
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
  // let dev.ludovic.netlib (MLlib's BLAS provider, bundled with Spark)
  // load its VectorBLAS implementation — without the incubator module the
  // k-means fit falls back to scalar F2J ("Failed to load implementation
  // from: dev.ludovic.netlib.blas.VectorBLAS" on every bench run)
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
