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

// ---------------------------------------------------------------------
// Parallel test groups: the suite grew to 60+ specs / ~25 min run
// sequentially in ONE forked JVM while the box has 32 cores and each
// spec's SparkSession is local[4] — the wall is suite-serialization,
// not compute. Partition the suites into independent forked JVMs that
// run CONCURRENTLY (each gets its own SparkSession, in-memory catalog
// and temp warehouse, so nothing is shared but the read-only
// /root/testdata). Suites are bin-packed greedily by measured wall
// (r17 baseline, -oD durations); unknown suites default to the median.
// Override the group count with SPARK_GRAFT_TEST_FORKS=1 to get the
// old single-JVM behavior.
val testForkCount = sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "6").toInt
// measured seconds per suite (r17 baseline); only the RELATIVE order
// matters for packing — a stale entry costs balance, never correctness
val suiteWeights: Map[String, Int] = Map(
  "graft.PlanQualitySpec" -> 130, // plans map now built on a pool
  "graft.streaming.IncrementalPageRankSpec" -> 195,
  "graft.streaming.ErasureSpec" -> 108,
  "graft.streaming.IncrementalSpansSpec" -> 68,
  "graft.streaming.IngestStreamWiringSpec" -> 37,
  "graft.operators.LlmOpsSpec" -> 37,
  "graft.operators.GraphOpsSpec" -> 32,
  "graft.streaming.IncrementalSkylineSpec" -> 30,
  "graft.streaming.IncrementalCCSpec" -> 28,
  "graft.streaming.IncrementalStatsSpec" -> 27,
  "graft.streaming.IncrementalDocFreqSpec" -> 26,
  "graft.streaming.IncrementalAggSpec" -> 25,
  "graft.streaming.ChangeFeedSpec" -> 24,
  "graft.streaming.IncrementalContainmentSpec" -> 23,
  "graft.streaming.IncrementalKnnGraphSpec" -> 22,
  "graft.operators.AnnTunerSpec" -> 22,
  "graft.streaming.IncrementalFunnelSpec" -> 21,
  "graft.operators.SelectionOpsSpec" -> 19,
  "graft.streaming.LakehouseSinkSpec" -> 18,
  "graft.streaming.CdcMergeSpec" -> 16,
  "graft.streaming.IvfBuildSpec" -> 16,
  "graft.streaming.IncrementalNearestJoinSpec" -> 15,
  "graft.streaming.CdcPipelineSpec" -> 14,
  "graft.streaming.IncrementalBm25Spec" -> 13,
  "graft.streaming.IncrementalFrameDedupSpec" -> 13,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // one ForkOptions PER GROUP, each with a distinct system property:
  // sbt runs groups whose fork options are EQUAL in one shared JVM,
  // which silently serializes the whole suite again
  def forkOpts(i: Int) = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector :+
      s"-Dgraft.test.group=g$i")
  if (testForkCount <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(forkOpts(0))))
  else {
    val defaultW = 8
    val bins = Array.fill(testForkCount)(
      (0L, scala.collection.mutable.ListBuffer[TestDefinition]()))
    tests.sortBy(t => -suiteWeights.getOrElse(t.name, defaultW))
      .foreach { t =>
        val i = bins.indices.minBy(bins(_)._1)
        bins(i) = (bins(i)._1 + suiteWeights.getOrElse(t.name, defaultW),
          bins(i)._2 += t)
      }
    bins.toSeq.zipWithIndex.collect {
      case ((_, ts), i) if ts.nonEmpty =>
        Tests.Group(s"g$i", ts.toSeq, Tests.SubProcess(forkOpts(i)))
    }
  }
}
// let the forked groups actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkCount),
  Tags.limitAll(math.max(4, testForkCount + 2)))
