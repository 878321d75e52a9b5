package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the maintained-kNN-graph harness (the shape
  * cdc46/48/49/50/51/57/59/60/61 all rebuild): drops, 4 folds,
  * bucket compaction, serve, analytics. Guide §1 — know WHICH phase
  * before touching anything. */
object KnnPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-knnprobe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%7.3f s  $label")
      r
    }
    for (rep <- 1 to reps) {
      println(s"== rep $rep (sf=$sfDir)")
      val table = "probe_knn"
      val s = spark
      timed("drop 16 state tables") {
        graft.streaming.IncrementalKnnGraph.tables(table)
          .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      }
      val vecs = graft.sources.Tables.load(s, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def part(lo: Long, hi: Long) =
        vecs.filter(col("vec_id") >= lo && col("vec_id") < hi)
      timed("fold b0 (first, creates)") {
        graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
          part(0L, 150L), 0L)
      }
      timed("fold b1") {
        graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
          part(150L, 300L), 1L)
      }
      timed("fold b1 redelivered (no-op)") {
        graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
          part(150L, 300L), 1L)
      }
      timed("compactBuckets(minParts=2)") {
        graft.streaming.IncrementalKnnGraph.compactBuckets(s, table,
          minParts = 2)
      }
      timed("fold b2 (rest of corpus)") {
        graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
          part(300L, Long.MaxValue), 2L)
      }
      val edges0 = timed("graphView noop") {
        val e = graft.streaming.IncrementalKnnGraph.graphView(s, table)
          .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        e.write.format("noop").mode("overwrite").save()
        e
      }
      val edges = timed("edges localCheckpoint") {
        if (sys.env.get("KNN_PROBE_CKPT_EDGES").contains("1"))
          edges0.localCheckpoint()
        else edges0
      }
      timed("pageRank(3) noop") {
        graft.operators.GraphOps.pageRank(edges,
            graft.sources.Tables.load(s, sfDir, "embeddings")
              .select(col("vec_id").as("vid")), iters = 3)
          .orderBy(col("vid"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("lpa(3) noop") {
        graft.operators.GraphOps.labelPropagation(edges, rounds = 3)
          .orderBy(col("vid"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("triangles noop") {
        graft.operators.GraphOps.triangles(edges)
          .orderBy(col("vid"))
          .write.format("noop").mode("overwrite").save()
      }
      System.gc(); Thread.sleep(100)
    }
    spark.stop()
  }
}
