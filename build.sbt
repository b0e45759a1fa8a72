ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "batch_publicspark"
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
// The bench driver parses the LAST stdout line as the result JSON.
// sbt's "[success] Total time: ..." epilogue used to print after it
// (BENCH_r09 "parsed": null — the driver fell back to a ~2000-char
// tail-scrape that truncated the per-query map). Suppress the success
// line and stream forked output straight to stdout so graft.Bench's
// final JSON line is genuinely the process's last stdout line.
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys ++= Set(run / outputStrategy, Global / showSuccess)
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
// Heap: fixed size + AlwaysPreTouch. This VM's first-touch page
// faults run at ~0.5 GB/s (20x slower than warm memory), so ANY heap
// growth mid-query burns kernel time and made identical bench runs
// swing 1.4s..76s. Pre-touching the whole heap at JVM startup moves
// that cost out of every timed region; Xms=Xmx prevents regrowth.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
