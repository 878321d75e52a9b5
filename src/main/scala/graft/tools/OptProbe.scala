package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable
import scala.util.control.NonFatal

/** Optimization-round measurement probe (guide §1): run named queries
  * once cold + once warm and attribute the WARM run's wall-clock to
  * individual Spark jobs, keyed by their call site — the breakdown the
  * bench's per-query seconds cannot give for multi-action harnesses
  * (a maintained-view query is 20+ control-plane jobs; knowing the
  * query is slow is useless without knowing WHICH job).
  *
  * Usage: runMain graft.tools.OptProbe <sfDir> <query>[,<query>...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("cdc49_pagerank_view")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-optprobe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(var t0: Long = 0L, var site: String = "",
      var group: String = "")
    val open = mutable.Map[Int, J]()
    val rows = mutable.ArrayBuffer[(String, Double)]()
    var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val props = Option(e.properties)
        val site = props
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(props
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(e.stageInfos.headOption.map(_.name).getOrElse("?"))
        open(e.jobId) = J(System.nanoTime(), site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        open.remove(e.jobId).foreach { j =>
          if (recording)
            rows.synchronized {
              rows += ((j.site, (System.nanoTime() - j.t0) / 1e9))
            }
        }
      }
    })

    val registry = SparkEntryRef.registry.filter(q => names.contains(q.name))
    registry.foreach { q =>
      // cold run: codegen + page cache priming, not recorded
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(e) => System.err.println(s"cold ${q.name}: $e") }
      graft.operators.DedupOps.unpersistShingleCaches(blocking = true)
      graft.operators.SkylineOps.unpersistShellCaches(blocking = true)
      System.gc(); Thread.sleep(200)
      rows.clear(); recording = true
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(e) => System.err.println(s"warm ${q.name}: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(100)
      val snap = rows.synchronized { rows.toVector }
      val bySite = snap.groupBy(_._1)
        .map { case (s, v) => (s, v.map(_._2).sum, v.size) }
        .toSeq.sortBy(-_._2)
      val jobSum = snap.map(_._2).sum
      println(f"== ${q.name}: wall ${wall}%.2f s, ${snap.size} jobs, " +
        f"job-time sum ${jobSum}%.2f s (gap = driver/planning " +
        f"${wall - jobSum}%.2f s)")
      bySite.take(40).foreach { case (s, t, n) =>
        println(f"  ${t}%7.3f s  x$n%-4d $s")
      }
      graft.operators.DedupOps.unpersistShingleCaches(blocking = true)
      graft.operators.SkylineOps.unpersistShellCaches(blocking = true)
      System.gc(); Thread.sleep(100)
    }
    spark.stop()
  }
}

/** Indirection so this tool compiles without importing graft.* at the
  * top level (keeps the tools package self-contained). */
private object SparkEntryRef {
  def registry: Seq[graft.GraftQuery] = graft.SparkEntry.registry
}
