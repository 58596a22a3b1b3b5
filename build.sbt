ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "devcontainersetlnodespark"
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
// Forked `run` output normally passes through sbt's logger, which
// prefixes every stdout line with "[info] " — that broke the bench
// collector's JSON-line parse (it anchors on a line starting with '{').
// StdoutOutput sends the forked JVM's stdout/stderr straight through.
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
// Default heap derived from the host's physical memory (r17 ADVICE: a
// flat 24g default OOM-killed the JVM on <24-32 GiB dev/CI hosts):
// a quarter of RAM, clamped to [4g, 24g]. On the 128 GiB bench sandbox
// this still lands on 24g (32 concurrent local-mode tasks share the
// heap; 8g spent the bench's tail in GC). SPARK_DRIVER_MEM overrides.
val defaultHeapGb: Int = {
  val physGb =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      (os.getTotalMemorySize / (1L << 30)).toInt
    } catch { case _: Throwable => 16 }
  math.max(4, math.min(24, physGb / 4))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
