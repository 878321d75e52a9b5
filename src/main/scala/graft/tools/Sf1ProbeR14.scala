package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CdcMerge, IncrementalBm25,
  IncrementalContainment, IncrementalSpans}

/** Round-14 scale probes — rows land in SCALE.md.
  *
  * bucket_compact: the incremental-compaction claim MEASURED. The
  * whole-grid compact() is a corpus-sized job with a table-rename
  * window; compactBuckets folds ONLY fragmented buckets. Protocol:
  * base batch covers every bucket of grids built from n and 10n docs
  * (nBuckets ∝ corpus), three single-doc trickle folds fragment a few
  * buckets, compactBuckets(minParts=2) compacts exactly those.
  * Read+write bytes must stay ∝ the fragmented buckets (FLAT at 10×
  * grid — per-bucket size is constant under the rebucket discipline),
  * and untouched buckets' files must be byte-identical.
  *
  * bm25_serve: the cdc44 queryView serving claim MEASURED. The grid
  * is partition-pruned to the query terms' _kb buckets and the
  * word IN filter pushes onto the (compacted: word-sorted) parquet —
  * read ∝ the TERMS' postings, never ∝ the corpus. Protocol: query 3
  * fixed-postings terms against postings built from n and 10n docs;
  * scanned AND shuffle-write bytes must stay flat.
  *
  * containment_batch: the cdc45 batchPairs serving claim MEASURED.
  * Candidates = owners of the batch's kept (df ≤ maxDf) shingles —
  * bounded by batch shingles × maxDf, independent of history size.
  * Protocol: serve a fixed 20-doc batch (5 docs quoting history
  * templates, 15 noise) against indexes of n and 10n docs;
  * shuffle-write must stay ∝ the batch's candidates (flat), while
  * the grid scan is column-pruned (reported for honesty — the df
  * lookups read the shingle column of the touched buckets).
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR14 [probe...]"
  * (no args = all probes)
  */
object Sf1ProbeR14 {

  def main(args: Array[String]): Unit = {
    val which =
      if (args.isEmpty) Set("bucket_compact", "bm25_serve",
        "containment_batch")
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
    def measured[T](f: => T): (T, Double, Long, Long, Long) = {
      Thread.sleep(100)
      val b0 = inBytes.get; val w0 = outBytes.get; val s0 = shufBytes.get
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      (r, wall, inBytes.get - b0, outBytes.get - w0, shufBytes.get - s0)
    }

    // the r13 template-corpus shape: ~33 token windows/doc, mostly
    // unique span keys + a 12-token template per (doc_id % 97) group
    def corpus(nDocs: Long) = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          expr("transform(sequence(1, 15), " +
            "i -> concat('u', id, '_', i))"),
          expr("transform(sequence(1, 12), " +
            "i -> concat('g', id % 97, '_', i))"),
          expr("transform(sequence(16, 30), " +
            "i -> concat('u', id, '_', i))")).as("text"))

    if (which("bucket_compact")) {
      import spark.implicits._
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r14probe_bc_$nb"
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalSpans.applyBatch(spark, table, corpus(n),
          batchId = 0, nBuckets = nb)
        // three single-doc trickle folds, ~2 fresh spans each: at
        // both scales they fragment ≤ 6 buckets (base + one trickle
        // generation reaches the minParts=2 threshold), so the
        // compaction work set is CONSTANT while the grid grows 10×
        (1 to 3).foreach { i =>
          val trickle = Seq((9000000L + i,
            (0 until 9).map(j => s"t${i}_$j").mkString(" ")))
            .toDF("doc_id", "text")
          IncrementalSpans.applyBatch(spark, table, trickle,
            batchId = i, nBuckets = nb)
        }
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        def files() = spark.table(table).inputFiles.toSet
        val before = files()
        val rowsBefore = spark.table(table).count()
        val (kbs, wall, scanned, written, _) = measured {
          IncrementalSpans.compactBuckets(spark, table, minParts = 2)
        }
        val after = files()
        val untouchedKbs = (0 until nb).map(_.toLong)
          .filterNot(kbs.contains).toSet
        val rewrittenUntouched = before.filter { f =>
          val kb = "_kb=([0-9]+)".r.findFirstMatchIn(f)
            .get.group(1).toLong
          untouchedKbs(kb) && !after.contains(f)
        }
        assert(rewrittenUntouched.isEmpty,
          s"${rewrittenUntouched.size} untouched-bucket files rewritten")
        assert(spark.table(table).count() == rowsBefore)
        println(f"PROBE bucket_compact docs=$n%7d nBuckets=$nb%4d  " +
          f"grid ${tableBytes / 1e6}%7.1f MB  compacted ${kbs.size}%3d" +
          f"/$nb buckets in $wall%5.1f s  " +
          f"scanned ${scanned / 1e6}%6.2f MB " +
          f"(${scanned * 100.0 / math.max(tableBytes, 1)}%5.1f%% of " +
          f"grid)  written ${written / 1e6}%6.2f MB  " +
          "untouched buckets byte-identical")
        IncrementalSpans.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("bm25_serve")) {
      Seq((20000L, 32), (200000L, 320)).foreach { case (n, nb) =>
        val table = s"r14probe_bm25_$nb"
        IncrementalBm25.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalBm25.applyBatch(spark, table, corpus(n),
          batchId = 0, nBuckets = nb)
        IncrementalBm25.compact(spark, table) // word-sorted buckets
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        // fixed-postings terms (each occurs in exactly one doc): the
        // serve must read ∝ THEIR postings, not the corpus
        val terms = Seq("u42_1", "u43_2", "u44_3")
        val (top, wall, scanned, _, shuffled) = measured {
          IncrementalBm25.queryView(spark, table, terms, k = 10)
            .collect().length
        }
        println(f"PROBE bm25_serve docs=$n%7d  postings " +
          f"${tableBytes / 1e6}%7.1f MB  query: 3 fixed-postings " +
          f"terms  read: $wall%5.1f s  " +
          f"scanned: ${scanned / 1e6}%6.2f MB " +
          f"(${scanned * 100.0 / math.max(tableBytes, 1)}%5.2f%% of " +
          f"postings)  shuffle-write: ${shuffled / 1e6}%6.3f MB  " +
          f"hits: $top%2d")
        IncrementalBm25.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    if (which("containment_batch")) {
      import spark.implicits._
      Seq(20000L, 200000L).foreach { n =>
        val nb = if (n > 50000) 320 else 32
        val table = s"r14probe_cont_$nb"
        IncrementalContainment.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
        IncrementalContainment.applyBatch(spark, table, corpus(n),
          batchId = 0, nBuckets = nb)
        // fixed 20-doc batch: 5 near-contained quoters (a 14-word
        // window of a history doc + 1 novel token → containment
        // 12/13 ≥ 0.8 against that doc) + 15 noise docs
        val batch = ((0 until 5).map { i =>
          val quoted = (1 to 14).map(j => s"u${i * 7}_$j")
          (8000000L + i, (quoted :+ s"z${i}_0").mkString(" "))
        } ++ (5 until 20).map { i =>
          (8000000L + i,
            (0 until 12).map(j => s"w${i}_$j").mkString(" "))
        }).toDF("doc_id", "text")
        IncrementalContainment.applyBatch(spark, table, batch,
          batchId = 1, nBuckets = nb)
        val tableBytes = spark.table(table).inputFiles
          .map(f => new java.io.File(
            new java.net.URI(f)).length()).sum
        val (pairs, wall, scanned, _, shuffled) = measured {
          IncrementalContainment.batchPairs(spark, table, batch)
            .collect().length
        }
        // the serve's scan unit: inverted-grid buckets hit by the
        // batch's shingles (∝ batch once nBuckets ≫ batch shingles;
        // the 1× side of this probe is bucket-SATURATED, so the
        // 1×→10× scan ratio understates the pruning)
        val hitKbs = graft.operators.DedupOps.docWordGrams(batch, 3)
          .select(pmod(xxhash64(col("shingle")), lit(nb.toLong)))
          .distinct().count()
        println(f"PROBE containment_batch docs=$n%7d  index " +
          f"${tableBytes / 1e6}%7.1f MB  batch: 20 docs " +
          f"(hit $hitKbs%3d/$nb buckets)  " +
          f"serve: $wall%5.1f s  scanned: ${scanned / 1e6}%7.1f MB  " +
          f"shuffle-write: ${shuffled / 1e6}%6.2f MB  " +
          f"pairs: $pairs%3d")
        IncrementalContainment.tables(table)
          .foreach(CdcMerge.dropStateTable(spark, _))
      }
    }

    spark.stop()
  }
}
