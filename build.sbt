ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamcdcspark"
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
// Forked run output goes straight to this process's stdout WITHOUT
// sbt's "[info] " line prefix: Bench/Verify print machine-parseable
// JSON lines that a wrapping harness json.loads()es per line, and the
// prefix has made every such parse fail (BENCH_r1–r9 all carry
// "parsed": null for exactly this reason).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pin the initial heap to the max: G1's adaptive sizing otherwise
  // starts at ~256 MB and re-learns the heap per run while tracking
  // host memory pressure — measured (r15 GC attribution) as a
  // code-independent 4-25x swing in per-query gc_ms between
  // identical runs of identical code. A fixed heap makes gc_ms
  // comparable across rounds; override with SPARK_DRIVER_XMS.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
