package graft.tools

import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round plan evidence (guide §7.2): one
  * `<outDir>/<query>_<tag>.txt` per query, holding the FORMATTED
  * physical plan of the DataFrame the query returns. Harness queries
  * (maintained views) run their state builds as a side effect; the
  * dumped plan is the final served read — the plan the serve cost
  * claims are about.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag>
  *          <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-plandump-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
        java.nio.file.Files.write(
          outDir.resolve(s"${q.name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"dumped ${q.name}_$tag.txt")
      } catch { case NonFatal(e) =>
        System.err.println(s"plandump ${q.name}: $e") }
      graft.operators.DedupOps.unpersistShingleCaches(blocking = true)
      graft.operators.SkylineOps.unpersistShellCaches(blocking = true)
    }
    spark.stop()
  }
}
