package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming._

/** Round-16 scale probes — 1× vs 10× corpora with state sizing
  * (nBuckets / nCells) scaled ∝ corpus, so per-bucket/per-cell sizes
  * stay constant and the claims under test are the operators', not
  * saturation artifacts (the r15 probe doctrine):
  *
  *  - `bm25_erase`: a FIXED 20-doc erasure wave against the
  *    maintained BM25 postings — claim: delete cost ∝ the docs' own
  *    words' buckets (the text-borne bucket pruning), never corpus;
  *    and the post-delete query serve stays term-bucket-pruned.
  *  - `knn_erase`: a FIXED 20-vector erasure against the maintained
  *    kNN graph — claim: owner discovery ∝ probers of the hit home
  *    cells, repair ∝ owners × their probed cells, rewrite ∝ hit
  *    buckets; flat when cells ∝ corpus.
  *  - `frame_serve`: cdc58's per-batch frame near-dup lookup —
  *    claim: ∝ the batch's fingerprints' buckets; the ledger append
  *    is O(ids) by construction.
  *  - `warm_rank`: warm vs cold rounds-to-gfp on the maintained
  *    graph after a ~5% ingest wave — the IncrementalPageRank lever,
  *    exactness spec-pinned, the ROUND SAVINGS measured here.
  *
  * Also prints the Spark JOB COUNT inside one kNN fold — the r15
  * verdict asked for the fold-latency floor pinned in writing
  * (SCALE.md cites these numbers). */
object Sf1ProbeR16 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty)
        Set("bm25_erase", "knn_erase", "frame_serve", "warm_rank")
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
    val shufBytes = new AtomicLong
    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def measured[T](f: => T): (T, Double, Long, Long, Long) = {
      Thread.sleep(150)
      val b0 = inBytes.get; val s0 = shufBytes.get; val j0 = jobs.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      (r, wall, inBytes.get - b0, shufBytes.get - s0, jobs.get - j0)
    }
    def tableBytes(table: String): Long =
      spark.table(table).inputFiles
        .map(f => new java.io.File(new java.net.URI(f)).length()).sum

    def vectors(lo: Long, n: Long) = spark.range(lo, lo + n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> " +
          "cast(cast(pmod(xxhash64(id * 64 + i), 1000) as double)" +
          " / 1000.0 - 0.5 as float))").as("embedding"))

    // ~30 unique tokens per doc (plus 3 shared terms in a sparse
    // slice) — the erasure wave deletes docs BY TEXT, exercising the
    // word-bucket pruning
    def docs(lo: Long, n: Long) = spark.range(lo, lo + n)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          expr("transform(sequence(1, 30), " +
            "i -> concat('u', id, '_', i))"),
          when(col("id") % 9973 === 0,
            lit("spark merge window")).otherwise(lit("")))
          .as("text"))

    if (which("bm25_erase")) {
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r16probe_bm25_$nb"
        IncrementalBm25.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalBm25.applyBatch(spark, table, docs(0, n),
          batchId = 0, nBuckets = nb)
        IncrementalBm25.compact(spark, table) // word-sorted buckets
        val idxMb = tableBytes(table) / 1e6
        // FIXED 20-doc erasure wave (text-borne)
        val (removed, wall, scanned, shuffled, _) = measured {
          IncrementalBm25.deleteDocs(spark, table,
            docs(0, n).filter(col("doc_id") % (n / 20) === 3))
        }
        val (_, qWall, qScanned, _, _) = measured {
          IncrementalBm25.queryView(spark, table,
            Seq("spark", "merge", "window"), k = 20).collect().length
        }
        println(f"PROBE bm25_erase docs=$n%7d  postings " +
          f"$idxMb%7.1f MB  delete(20 docs): $wall%5.1f s  " +
          f"scanned ${scanned / 1e6}%6.2f MB " +
          f"(${scanned * 100.0 / math.max(idxMb * 1e6, 1)}%5.2f%% " +
          f"of postings)  shuffle ${shuffled / 1e6}%6.3f MB  " +
          f"removed $removed%3d  |  post-delete query: $qWall%5.2f s " +
          f"scanned ${qScanned / 1e6}%6.2f MB")
        IncrementalBm25.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("knn_erase")) {
      // three scales: at 20k/64 the probes rewrite SATURATES (the
      // candidate owners' probed cells cover all 64 cells), so the
      // smallest point under-reads the per-delete cost — the
      // 10x -> 25x pair is the unsaturated regime the flatness claim
      // lives in (the r15 probe-regime lesson)
      Seq((20000L, 64, 64), (200000L, 640, 640),
          (500000L, 1600, 1600)).foreach {
        case (n, nCells, nb) =>
          val table = s"r16probe_knn_$nb"
          IncrementalKnnGraph.tables(table)
            .foreach(CdcMerge.dropStateTable(spark, _))
          IncrementalKnnGraph.applyBatch(spark, table, vectors(0, n),
            batchId = 0, nBuckets = nb, nCentroids = nCells)
          // job count of ONE marginal fold — the fold-latency floor
          // the r15 verdict asked to pin in writing
          val (_, fWall, _, _, fJobs) = measured {
            IncrementalKnnGraph.applyBatch(spark, table,
              vectors(9000000L, 20), batchId = 1, nBuckets = nb,
              nCentroids = nCells)
          }
          val gridMb = tableBytes(table) / 1e6
          // FIXED 20-vector erasure
          val del = (0 until 20).map(i => 100L + i * (n / 25))
          val (removed, wall, scanned, shuffled, dJobs) = measured {
            IncrementalKnnGraph.deleteVectors(spark, table, del)
          }
          println(f"PROBE knn_erase vecs=$n%7d nCells=$nCells%4d  " +
            f"grid $gridMb%7.1f MB  " +
            f"fold(20): $fWall%5.1f s $fJobs%3d jobs  |  " +
            f"delete(20 vecs): $wall%5.1f s  " +
            f"scanned ${scanned / 1e6}%7.1f MB  " +
            f"shuffle ${shuffled / 1e6}%6.2f MB  $dJobs%3d jobs  " +
            f"removed $removed%3d")
          IncrementalKnnGraph.tables(table)
            .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("frame_serve")) {
      // ~130-byte payloads → ~8 frame slices each
      def payloads(lo: Long, n: Long) = spark.range(lo, lo + n)
        .select(col("id").as("doc_id"),
          concat_ws(" ", expr("transform(sequence(1, 16), " +
            "i -> concat('f', id, '_', i))")).as("text"),
          lit("probe").as("source"))
      Seq((50000L, 32), (500000L, 320)).foreach { case (n, nb) =>
        val table = s"r16probe_frm_$nb"
        IncrementalFrameDedup.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalFrameDedup.applyBatch(spark, table,
          graft.operators.MultimodalOps.toMediaColumns(payloads(0, n)),
          batchId = 0, nBuckets = nb)
        IncrementalFrameDedup.compact(spark, table) // fprint-sorted
        val idxMb = tableBytes(table) / 1e6
        // fixed 20-payload batch: 5 re-cuts of history + 15 noise
        val batch = graft.operators.MultimodalOps.toMediaColumns(
          payloads(0, 5).withColumn("doc_id", col("doc_id") + 8000000L)
            .unionByName(payloads(8100000L, 15)))
        IncrementalFrameDedup.applyBatch(spark, table, batch,
          batchId = 1, nBuckets = nb)
        val (pairs, wall, scanned, shuffled, _) = measured {
          IncrementalFrameDedup.batchPairs(spark, table, batch)
            .collect().length
        }
        println(f"PROBE frame_serve docs=$n%7d  postings " +
          f"$idxMb%7.1f MB  serve(20 payloads): $wall%5.1f s  " +
          f"scanned ${scanned / 1e6}%6.2f MB " +
          f"(${scanned * 100.0 / math.max(idxMb * 1e6, 1)}%5.2f%% " +
          f"of postings)  shuffle ${shuffled / 1e6}%6.3f MB  " +
          f"pairs: $pairs%3d")
        IncrementalFrameDedup.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("warm_rank")) {
      val (n, nCells, nb) = (20000L, 64, 64)
      val gT = "r16probe_rank_g"
      val rT = "r16probe_rank_r"
      (IncrementalKnnGraph.tables(gT) ++ IncrementalPageRank.tables(rT))
        .foreach(CdcMerge.dropStateTable(spark, _))
      IncrementalKnnGraph.applyBatch(spark, gT, vectors(0, n),
        batchId = 0, nBuckets = nb, nCentroids = nCells)
      def verts(hi: Long) = spark.range(hi).select(col("id").as("vid"))
      val (cold, cWall, _, _, _) = measured {
        IncrementalPageRank.refresh(spark, gT, rT, verts(n))
      }
      // ~5% ingest wave, then the warm refresh
      IncrementalKnnGraph.applyBatch(spark, gT,
        vectors(n, n / 20), batchId = 1, nBuckets = nb,
        nCentroids = nCells)
      val (warm, wWall, _, _, _) = measured {
        IncrementalPageRank.refresh(spark, gT, rT,
          verts(n + n / 20))
      }
      println(f"PROBE warm_rank vecs=$n%6d (+5%% wave)  " +
        f"cold: ${cold._2}%3d rounds $cWall%6.1f s  |  " +
        f"warm: ${warm._2}%3d rounds $wWall%6.1f s  " +
        f"(saved ${cold._2 - warm._2}%3d rounds)")
      (IncrementalKnnGraph.tables(gT) ++ IncrementalPageRank.tables(rT))
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    spark.stop()
  }
}
