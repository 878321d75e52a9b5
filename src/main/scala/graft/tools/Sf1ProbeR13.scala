package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CdcMerge, IncrementalSkyline, IncrementalSpans}

/** Round-13 scale probes — rows land in SCALE.md.
  *
  * span_write: the cdc40 append-shaped-fold claim MEASURED. Before
  * round 13 the span grid was a CdcMerge hash-bucketed MERGE table —
  * span keys are uniform md5 hashes, so any batch with ≳nBuckets
  * distinct spans touched every bucket and each fold rewrote the
  * whole corpus-sized grid. Now a fold appends into its own `_b`
  * generation: per-fold WRITE ∝ batch, flat as the grid grows 10×.
  * Protocol: build the grid from corpora of n and 10n docs (nBuckets
  * scaled ∝ corpus — the rebucket discipline), fold ONE trickle doc,
  * read scanned bytes off `inputMetrics.bytesRead` and written bytes
  * off `outputMetrics.bytesWritten` — mirroring the r12
  * retention_scan row.
  *
  * skyline_bigwrite: the cdc37 write-path gate MEASURED. The r12
  * watch item: above the 100k shell gate the COMPUTE stage already
  * avoided the broadcast, but the maintained fold still rewrote the
  * whole frontier through one `coalesce(1)` task. Now the staged
  * rewrite hash-spreads. Protocol: fold a 150k-point anti-correlated
  * diagonal (the frontier IS the batch) plus a second dominated
  * batch; assert the state table holds >1 file (no single-task
  * rewrite) and the frontier stays exact.
  *
  * span_serve: the cdc41 removalView serving claim MEASURED. The view
  * restricts the grid to the requested docs' span keys BEFORE the
  * n_docs aggregate — at shard-sized requests the key set broadcasts,
  * so the grid is scanned (unavoidable: the repeat statistic is
  * global) but never SHUFFLED. Protocol: serve a fixed 200-doc shard
  * from grids of n and 10n docs; shuffle-write bytes must stay ∝ the
  * request (flat), not ∝ the grid.
  *
  * df_serve: the cdc43 keywordView serving claim, same protocol — a
  * fixed 200-doc shard keyword-tagged against df tables built from n
  * and 10n docs; shuffle-write bytes must stay ∝ the request.
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR13 [probe...]"
  * (no args = all probes)
  */
object Sf1ProbeR13 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty) Set("span_write", "skyline_bigwrite",
        "span_serve", "df_serve")
      else args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inBytes = new AtomicLong
    val outBytes = new AtomicLong
    val shufBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          outBytes.addAndGet(m.outputMetrics.bytesWritten)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
    })
    def measured[T](f: => T): (T, Double, Long, Long) = {
      Thread.sleep(100) // drain straggler task-end events
      val b0 = inBytes.get
      val w0 = outBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0, outBytes.get - w0)
    }
    def measuredS[T](f: => T): (T, Double, Long, Long) = {
      Thread.sleep(100)
      val b0 = inBytes.get
      val s0 = shufBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0, shufBytes.get - s0)
    }

    if (which("span_write")) {
      // synthetic template corpus (the r12 span_scan shape): each doc
      // = 15 unique tokens + a 12-token template shared by its
      // (doc_id % 97) group + 15 more unique tokens — grid rows ∝
      // corpus token windows (~33/doc, mostly unique span keys: the
      // uniform-hash worst case for the old merge-shaped fold)
      def corpus(nDocs: Long) = spark.range(nDocs)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 15), " +
              "i -> concat('u', id, '_', i))"),
            expr("transform(sequence(1, 12), " +
              "i -> concat('g', id % 97, '_', i))"),
            expr("transform(sequence(16, 30), " +
              "i -> concat('u', id, '_', i))")).as("text"))
      import spark.implicits._
      // one 40-token trickle doc: ~33 distinct fresh spans — more
      // spans than the 1× bucket count, the case that made the merge
      // fold touch EVERY bucket
      val trickle = Seq((9999999L,
        (0 until 40).map(j => s"z_$j").mkString(" ")))
        .toDF("doc_id", "text")
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r13probe_spans_$nb"
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        val (_, tBuild, _, _) = measured {
          (0 until 3).foreach(i => IncrementalSpans.applyBatch(spark,
            table, corpus(n).filter(pmod(col("doc_id"), lit(3)) === i),
            batchId = i, nBuckets = nb))
        }
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        val gridRows = spark.table(table).count()
        val (_, tTrickle, scanned, written) = measured {
          IncrementalSpans.applyBatch(spark, table, trickle,
            batchId = 3, nBuckets = nb)
        }
        println(f"PROBE span_write docs=$n%7d nBuckets=$nb%4d  " +
          f"build: $tBuild%6.1f s  grid: $gridRows%9d rows " +
          f"${tableBytes / 1e6}%7.1f MB  trickle: $tTrickle%5.1f s  " +
          f"scanned: ${scanned / 1e6}%7.2f MB " +
          f"(${scanned * 100.0 / math.max(tableBytes, 1)}%5.1f%% of " +
          f"table)  written: ${written / 1e6}%7.2f MB")
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("span_serve")) {
      // the span_write corpus shape: ~33 windows/doc, mostly unique
      // span keys, plus a 12-token template per (doc_id % 97) group
      def corpus(nDocs: Long) = spark.range(nDocs)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 15), " +
              "i -> concat('u', id, '_', i))"),
            expr("transform(sequence(1, 12), " +
              "i -> concat('g', id % 97, '_', i))"),
            expr("transform(sequence(16, 30), " +
              "i -> concat('u', id, '_', i))")).as("text"))
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r13probe_serve_$nb"
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalSpans.applyBatch(spark, table, corpus(n),
          batchId = 0, nBuckets = nb)
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        // fixed 200-doc shard regardless of grid size — the serving
        // pattern (reads per shard of the training corpus)
        val req = corpus(n).filter(col("doc_id") < 200)
          .localCheckpoint()
        val (cut, wall, scanned, shuffled) = measuredS {
          IncrementalSpans.removalView(spark, table, req)
            .agg(sum("n_tok_removed")).collect()(0).getLong(0)
        }
        println(f"PROBE span_serve docs=$n%7d  grid " +
          f"${tableBytes / 1e6}%7.1f MB  request: 200 docs  " +
          f"read: $wall%5.1f s  scanned: ${scanned / 1e6}%7.1f MB  " +
          f"shuffle-write: ${shuffled / 1e6}%7.2f MB  " +
          f"tok_removed: $cut%6d")
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("df_serve")) {
      // the span_serve corpus shape — per-doc unique tokens plus a
      // shared group template: vocabulary ∝ corpus here (the
      // adversarial case; real text is sublinear by Heaps' law)
      def corpus(nDocs: Long) = spark.range(nDocs)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 15), " +
              "i -> concat('u', id, '_', i))"),
            expr("transform(sequence(1, 12), " +
              "i -> concat('g', id % 97, '_', i))"),
            expr("transform(sequence(16, 30), " +
              "i -> concat('u', id, '_', i))")).as("text"))
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r13probe_df_$nb"
        graft.streaming.IncrementalDocFreq.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        graft.streaming.IncrementalDocFreq.applyBatch(spark, table,
          corpus(n), batchId = 0, nBuckets = nb)
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        val req = corpus(n).filter(col("doc_id") < 200)
          .localCheckpoint()
        val (rows, wall, scanned, shuffled) = measuredS {
          graft.streaming.IncrementalDocFreq
            .keywordView(spark, table, req, m = 3).count()
        }
        println(f"PROBE df_serve  docs=$n%7d  df-table " +
          f"${tableBytes / 1e6}%7.1f MB  request: 200 docs  " +
          f"read: $wall%5.1f s  scanned: ${scanned / 1e6}%7.1f MB  " +
          f"shuffle-write: ${shuffled / 1e6}%7.2f MB  rows: $rows%5d")
        graft.streaming.IncrementalDocFreq.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("skyline_bigwrite")) {
      // 150k-point anti-correlated diagonal (nothing dominates
      // anything — the frontier IS the batch) folded as batch 0, then
      // a strictly-dominated batch 1: the second fold reads the
      // spread state, recomputes, and rewrites — never one task
      val nF = 150000L
      val table = "r13probe_skyfrontier"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
      val diag = spark.range(nF).select(col("id"),
        (col("id") * 66).as("x"),
        (lit(10000000L) - col("id") * 66).as("y"))
      val noise = spark.range(nF).select((col("id") + nF).as("id"),
        (col("id") * 66 - col("id") % 7 - 1).as("x"),
        (lit(10000000L) - col("id") * 66 - col("id") % 5 - 1).as("y"))
      val (_, w0, _, wr0) = measured {
        IncrementalSkyline.applyBatch(spark, table, diag, "id",
          Seq("x", "y"), Nil)
      }
      val files0 = spark.table(table).inputFiles.length
      val (_, w1, _, wr1) = measured {
        IncrementalSkyline.applyBatch(spark, table, noise, "id",
          Seq("x", "y"), Nil)
      }
      val files1 = spark.table(table).inputFiles.length
      val nFront = spark.table(table).count()
      assert(nFront == nF, s"frontier $nFront != $nF")
      assert(files0 > 1 && files1 > 1,
        s"single-file frontier write: $files0 / $files1")
      println(f"PROBE skyline_bigwrite frontier=$nFront%7d  " +
        f"fold0: $w0%6.1f s ${wr0 / 1e6}%6.1f MB -> $files0%3d " +
        f"files  fold1(dominated batch): $w1%6.1f s " +
        f"${wr1 / 1e6}%6.1f MB -> $files1%3d files  " +
        "(spread staged rewrite, no coalesce(1) task)")
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    spark.stop()
  }
}
