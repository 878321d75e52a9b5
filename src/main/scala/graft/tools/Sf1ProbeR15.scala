package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CdcMerge, IncrementalAnn, IncrementalBm25,
  IncrementalKnnGraph, IncrementalMediaDedup}

/** Round-15 scale probes — rows land in SCALE.md.
  *
  * knn_fold: the cdc46 maintained-graph claim MEASURED. A fold's cost
  * is forward (batch × probed-cell size) + reverse repair (batch ×
  * per-cell prober count) — both constant when cells are sized
  * constant (nCells ∝ corpus, the IncrementalAnn rebucket
  * discipline). Protocol: graphs built from n and 10n vectors
  * (nCells ∝ corpus), then ONE fixed 20-vector batch folded on top
  * (batch ≪ nCells at both scales — the regime the claim is about);
  * wall and shuffle must stay ~flat at 10× corpus, and the graph
  * serve for 10 requested ids must stay bucket-pruned (scan ≪ grid).
  *
  * media_serve: the cdc47 batchPairs claim MEASURED. Candidate
  * discovery for a batch reads ∝ the batch's band keys' buckets
  * (bucket-literal pruning, probe broadcast). Protocol: a fixed
  * 20-payload batch (5 exact dups of history payloads + 15 noise)
  * served against postings built from n and 10n payloads; scanned
  * and shuffle-write bytes must stay flat.
  *
  * rrf_serve: the cdc48 fusion-serve claim MEASURED. The fused read
  * = BM25 terms' postings buckets + the query's probed IVF cells +
  * a k² fuse of two 20-row lists — none of it ∝ corpus. Protocol:
  * one fused query against maintained state built from n and 10n
  * docs/vectors; wall and scanned bytes must stay ~flat (the IVF
  * probe reads its cells' partitions, constant-sized under
  * nCells ∝ corpus).
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR15 [probe...]"
  * (no args = all probes)
  */
object Sf1ProbeR15 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty) Set("knn_fold", "media_serve", "rrf_serve")
      else args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-probe-wh").toString)
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
    def measured[T](f: => T): (T, Double, Long, Long, Long) = {
      Thread.sleep(100)
      val b0 = inBytes.get; val w0 = outBytes.get; val s0 = shufBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0, outBytes.get - w0, shufBytes.get - s0)
    }
    def tableBytes(table: String): Long =
      spark.table(table).inputFiles
        .map(f => new java.io.File(new java.net.URI(f)).length()).sum

    // deterministic pseudo-random unit-scale embeddings (no RNG —
    // xxhash64 of (id, i) folded into [-0.5, 0.5))
    def vectors(lo: Long, n: Long) = spark.range(lo, lo + n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> " +
          "cast(cast(pmod(xxhash64(id * 64 + i), 1000) as double)" +
          " / 1000.0 - 0.5 as float))").as("embedding"))

    if (which("knn_fold")) {
      Seq((20000L, 64, 64), (200000L, 640, 640)).foreach {
        case (n, nCells, nb) =>
          val table = s"r15probe_knn_$nb"
          IncrementalKnnGraph.tables(table)
            .foreach(CdcMerge.dropStateTable(spark, _))
          IncrementalKnnGraph.applyBatch(spark, table, vectors(0, n),
            batchId = 0, nBuckets = nb, nCentroids = nCells)
          val gridMb = tableBytes(table) / 1e6
          // ONE fixed 20-vector batch on top: the marginal fold.
          // Batch ≪ nCells at BOTH scales (20 vs 64/640), so the
          // touched-cell count is batch-bounded and the claim under
          // test — cost ∝ batch × cell size — is actually the
          // regime being measured; a cell-saturating batch (its own
          // honest case) scales with the cells it touches instead.
          val (_, wall, scanned, _, shuffled) = measured {
            IncrementalKnnGraph.applyBatch(spark, table,
              vectors(9000000L, 20), batchId = 1, nBuckets = nb,
              nCentroids = nCells)
          }
          // serve: 10 requested ids, bucket-pruned
          val ids = (0 until 10).map(i => i * 97L)
          val (got, sWall, sScanned, _, sShuffled) = measured {
            IncrementalKnnGraph.neighborsOf(spark, table, ids)
              .collect().length
          }
          println(f"PROBE knn_fold vecs=$n%7d nCells=$nCells%4d  " +
            f"grid $gridMb%7.1f MB  fold(20 vecs): $wall%5.1f s  " +
            f"scanned ${scanned / 1e6}%7.1f MB  " +
            f"shuffle ${shuffled / 1e6}%6.2f MB  |  " +
            f"serve(10 ids): $sWall%5.2f s  " +
            f"scanned ${sScanned / 1e6}%6.2f MB  " +
            f"shuffle ${sShuffled / 1e6}%6.3f MB  rows $got%3d")
          IncrementalKnnGraph.tables(table)
            .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("media_serve")) {
      import spark.implicits._
      // ~60-byte payloads, unique per doc
      def payloads(lo: Long, n: Long) = spark.range(lo, lo + n)
        .select(col("id").as("doc_id"),
          concat_ws(" ", expr("transform(sequence(1, 8), " +
            "i -> concat('m', id, '_', i))")).as("text"),
          lit("probe").as("source"))
      Seq((50000L, 32), (500000L, 320)).foreach { case (n, nb) =>
        val table = s"r15probe_mdd_$nb"
        IncrementalMediaDedup.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalMediaDedup.applyBatch(spark, table,
          graft.operators.MultimodalOps.toMediaColumns(payloads(0, n)),
          batchId = 0, nBuckets = nb)
        IncrementalMediaDedup.compact(spark, table) // key-sorted
        val idxMb = tableBytes(table) / 1e6
        // fixed 20-payload batch: 5 exact dups of history + 15 noise
        val batch = graft.operators.MultimodalOps.toMediaColumns(
          (payloads(0, 5).withColumn("doc_id",
            col("doc_id") + 8000000L))
            .unionByName(payloads(8100000L, 15)))
        IncrementalMediaDedup.applyBatch(spark, table, batch,
          batchId = 1, nBuckets = nb)
        val (pairs, wall, scanned, _, shuffled) = measured {
          IncrementalMediaDedup.batchPairs(spark, table, batch)
            .collect().length
        }
        println(f"PROBE media_serve docs=$n%7d  postings " +
          f"$idxMb%7.1f MB  batch: 20 payloads  " +
          f"serve: $wall%5.1f s  scanned ${scanned / 1e6}%6.2f MB " +
          f"(${scanned * 100.0 / math.max(idxMb * 1e6, 1)}%5.2f%% " +
          f"of postings)  shuffle ${shuffled / 1e6}%6.3f MB  " +
          f"pairs: $pairs%3d")
        IncrementalMediaDedup.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("rrf_serve")) {
      // corpus text: ~30 unique tokens per doc + 3 fixed-postings
      // query terms planted in a handful of docs
      def docs(n: Long) = spark.range(n)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            expr("transform(sequence(1, 30), " +
              "i -> concat('u', id, '_', i))"),
            when(col("id") % 9973 === 0,
              lit("spark merge window")).otherwise(lit("")))
            .as("text"))
      Seq((20000L, 64, 32), (200000L, 640, 320)).foreach {
        case (n, nCells, nb) =>
          val pT = s"r15probe_rrf_p_$nb"
          val aT = s"r15probe_rrf_a_$nb"
          IncrementalBm25.tables(pT)
            .foreach(CdcMerge.dropStateTable(spark, _))
          Seq(aT, IncrementalAnn.centTable(aT))
            .foreach(CdcMerge.dropStateTable(spark, _))
          IncrementalBm25.applyBatch(spark, pT, docs(n), batchId = 0,
            nBuckets = nb)
          IncrementalBm25.compact(spark, pT) // word-sorted buckets
          IncrementalAnn.indexBatch(spark, aT, vectors(0, n),
            nCentroids = nCells)
          val stateMb = (tableBytes(pT) + tableBytes(aT)) / 1e6
          val query = vectors(0, n).filter(col("vec_id") === 10L)
            .select(col("vec_id").as("query_id"),
              col("embedding").as("q_emb"))
          val (fused, wall, scanned, _, shuffled) = measured {
            val lex = graft.operators.RetrievalOps.rankedTopK(
                IncrementalBm25.queryView(spark, pT,
                  Seq("spark", "merge", "window"), k = 20),
                "bm25", 20)
              .withColumnRenamed("rnk", "lex_rnk")
            val sem = IncrementalAnn.searchTopK(spark, aT, query,
                nProbe = 2, k = 20)
              .select(col("neighbor_id").as("doc_id"),
                col("rnk").as("sem_rnk"))
            graft.operators.RetrievalOps.rrfFuse(lex, sem)
              .collect().length
          }
          println(f"PROBE rrf_serve docs=$n%7d  state " +
            f"$stateMb%7.1f MB  fused query (3 terms + 1 vector): " +
            f"$wall%5.1f s  scanned ${scanned / 1e6}%6.2f MB  " +
            f"shuffle ${shuffled / 1e6}%6.3f MB  rows: $fused%3d")
          IncrementalBm25.tables(pT)
            .foreach(CdcMerge.dropStateTable(spark, _))
          Seq(aT, IncrementalAnn.centTable(aT))
            .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    spark.stop()
  }
}
