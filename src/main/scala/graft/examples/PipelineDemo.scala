package graft.examples

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CdcOps
import graft.sources.Tables
import graft.streaming._

/** Runnable end-to-end demo of the CDC pipeline: replay the events table
  * through envelope → filter chain → packed file-queue sink with
  * checkpointing and an external position mirror, then print sink stats.
  *
  * Usage: sbt "runMain graft.examples.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft-demo").toString
    val src = s"$work/source"
    val sinkDir = s"$work/sink"
    val posDir = s"$work/positions"

    // stage the replay source (normalizes the nanos timestamps)
    Tables.load(spark, sfDir, "events")
      .repartition(4).write.parquet(src)

    val store = new FilePositionStore(posDir)
    spark.streams.addListener(
      new PositionListener(store, "parquet-replay", src))

    val chain = CdcOps.FilterChain.of(
      _.filter(col("event_type") =!= "Skip"))
    val t0 = System.nanoTime()
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      sourceDir = src,
      sinkConf = Map("dir" -> sinkDir),
      checkpointDir = s"$work/checkpoint",
      chain = chain,
      availableNow = true))
    q.awaitTermination()
    val elapsed = (System.nanoTime() - t0) / 1e9

    val files = Files.list(Paths.get(sinkDir)).iterator().asScala
      .filter(_.toString.endsWith(".jsonl")).toSeq
    val lines = files.flatMap(p => Files.readAllLines(p).asScala)
    println(s"[demo] sink batches: ${files.size}")
    println(s"[demo] delivered events: ${lines.size}")
    println(f"[demo] pipeline wall time: $elapsed%.2f s " +
      f"(${lines.size / elapsed}%.0f events/s; reference envelope is " +
      "10 events / 5 s on 0.5 CPU, see BASELINE.md)")
    println(s"[demo] sample: ${lines.headOption.getOrElse("<none>")}")
    println(s"[demo] mirrored position: ${
      store.read("parquet-replay", src).getOrElse("<none>")}")
    spark.stop()
  }
}
