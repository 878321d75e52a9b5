package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** Scale probe: time the heavy dedup/similarity operators at 1× and 4×
  * corpus size and print the wall-time growth factor. Sub-linear-in-n²
  * growth (≈ input growth, not pair growth) is the property that says
  * the pipeline shape survives 100 TB.
  *
  * The 4× corpus unions the documents table with 3 shifted copies —
  * every doc gains 3 exact twins, a worst-case near-dup clique
  * explosion (output pairs grow ~w², wall time must not).
  *
  * Usage: sbt "runMain graft.tools.ScaleProbe [sfDir]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs1 = Tables.load(spark, sfDir, "documents")
    val n1 = docs1.count()
    val docs4 = (0 until 4).map(i =>
      docs1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ union _)
    val embs1 = Tables.load(spark, sfDir, "embeddings")
    val embs4 = (0 until 4).map(i =>
      embs1.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L)))
      .reduce(_ union _)

    def time(f: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f.count()
      val t = (System.nanoTime() - t0) / 1e9
      // drain per-call shingle caches so repeated probes measure a
      // cold plan and the session never accumulates cached blocks
      DedupOps.unpersistShingleCaches(blocking = true)
      (t, rows)
    }

    def probe(name: String)(f1: => DataFrame, f4: => DataFrame): Unit = {
      val (warm, _) = time(f1) // codegen warm
      val (t1, r1) = time(f1)
      val (t4, r4) = time(f4)
      println(f"PROBE $name%-26s 1x: $t1%6.2f s / $r1%7d rows   " +
        f"4x: $t4%6.2f s / $r4%7d rows   wall x${t4 / t1}%.1f  " +
        f"rows x${if (r1 == 0) 0.0 else r4.toDouble / r1}%.0f  (warm $warm%.1f)")
    }

    println(s"[scale-probe] $sfDir docs=$n1 (4x=${4 * n1})")
    probe("minhash_bigram") (
      DedupOps.verifiedNearDups(docs1),
      DedupOps.verifiedNearDups(docs4))
    probe("minhash_chartrigram") (
      DedupOps.verifiedNearDupsFrom(DedupOps.docCharTrigrams(docs1),
        minJ = 0.35, maxDocFrac = 0.2),
      DedupOps.verifiedNearDupsFrom(DedupOps.docCharTrigrams(docs4),
        minJ = 0.35, maxDocFrac = 0.2))
    probe("embedding_neardup") (
      SimilarityOps.embeddingNearDups(embs1, minCos = 0.35),
      SimilarityOps.embeddingNearDups(embs4, minCos = 0.35))
    probe("exact_dedup") (
      DedupOps.exactDupGroups(docs1),
      DedupOps.exactDupGroups(docs4))
    probe("kmeans_2iter") (
      graft.operators.CurationOps.kmeans(embs1, 64, 8, 2)._1,
      graft.operators.CurationOps.kmeans(embs4, 64, 8, 2)._1)
    probe("repetition") (
      graft.operators.CurationOps.repetitionStats(docs1),
      graft.operators.CurationOps.repetitionStats(docs4))
    // the 4x twin corpus turns every doc into a 4-clique — CC input
    // pairs grow ~quadratically while output clusters grow ~linearly;
    // wall should track pairs (the join work), not explode
    probe("dup_clusters") (
      DedupOps.connectedComponents(
        DedupOps.verifiedNearDups(docs1).select("doc_a", "doc_b")),
      DedupOps.connectedComponents(
        DedupOps.verifiedNearDups(docs4).select("doc_a", "doc_b")))

    // CDC merge throughput: apply the events stream as 4 batches into
    // the partitioned state table; report events/s and that a second
    // pass (pure redelivery) costs no more than the first (idempotent
    // merge, work ∝ touched partitions).
    {
      import graft.operators.CdcOps
      import graft.streaming.CdcMerge
      val st = "scaleprobe_merge_state"
      Seq(st, s"${st}_stage").foreach(CdcMerge.dropStateTable(spark, _))
      val env = CdcOps.dropSkipped(
        CdcOps.toEnvelope(Tables.load(spark, sfDir, "events")))
      val nEvents = env.count()
      def applyAll(): Double = {
        val t0 = System.nanoTime()
        (0 until 4).foreach { i =>
          CdcMerge.applyBatch(spark, st,
            env.filter(pmod(col("event_id"), lit(4)) === i),
            "user_id", Seq("ts", "event_id"), nBuckets = 16)
        }
        (System.nanoTime() - t0) / 1e9
      }
      val tFirst = applyAll()
      val tReplay = applyAll()
      // warmed from-scratch rebuild: the fair baseline for the feed
      // overhead below (tFirst absorbs session/codegen warmup)
      Seq(st, s"${st}_stage").foreach(CdcMerge.dropStateTable(spark, _))
      val tWarm = applyAll()
      println(f"PROBE cdc_merge               4 batches/$nEvents%d events: " +
        f"$tFirst%6.2f s (${nEvents / tFirst}%.0f ev/s)   " +
        f"replay: $tReplay%6.2f s (idempotent, no growth)   " +
        f"warm rebuild: $tWarm%6.2f s")

      // merge WITH change-data-feed: what the journal costs on top
      val stF = "scaleprobe_feed_state"
      val fd = "scaleprobe_feed"
      Seq(stF, s"${stF}_stage", fd)
        .foreach(CdcMerge.dropStateTable(spark, _))
      val t0 = System.nanoTime()
      (0 until 4).foreach { i =>
        graft.streaming.ChangeFeed.applyBatch(spark, stF, fd,
          env.filter(pmod(col("event_id"), lit(4)) === i),
          "user_id", Seq("ts", "event_id"), nBuckets = 16,
          batchId = i.toLong)
      }
      val tFeed = (System.nanoTime() - t0) / 1e9
      val feedRows = spark.table(fd).count()
      println(f"PROBE cdc_merge_feed          4 batches/$nEvents%d events: " +
        f"$tFeed%6.2f s (${nEvents / tFeed}%.0f ev/s)   " +
        f"feed rows: $feedRows%d (journal overhead vs warm rebuild " +
        f"${(tFeed / tWarm - 1) * 100}%.0f%%)")
    }
    // Incremental LSH index: total cost of indexing the corpus in 4
    // batches vs the one-shot sweep, and the marginal cost of ONE more
    // batch against the full index — the number that decides whether
    // a streaming corpus can afford per-arrival dedup. Also the
    // replay batch (must be ~free: anti-join finds nothing).
    {
      import graft.streaming.IncrementalDedup
      val idx = "scaleprobe_lshidx"
      graft.streaming.CdcMerge.dropStateTable(spark, idx)
      def batch(i: Int) = docs1.filter(pmod(col("doc_id"), lit(4)) === i)
      val t0 = System.nanoTime()
      val nCands = (0 until 4).map { i =>
        IncrementalDedup.indexBatch(spark, idx, batch(i)).count()
      }.sum
      val tInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nReplay = IncrementalDedup.indexBatch(spark, idx, batch(3)).count()
      val tReplay = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nOne = DedupOps.lshCandidates(DedupOps.lshBands(
        DedupOps.minhashSignature(docs1))).count()
      val tOne = (System.nanoTime() - t2) / 1e9
      println(f"PROBE incremental_lsh         4 batches: $tInc%6.2f s " +
        f"/ $nCands%d cands   one-shot: $tOne%6.2f s / $nOne%d cands   " +
        f"replay batch: $tReplay%6.2f s / $nReplay%d cands")
      // compaction read-amp: the index accretes one file set per
      // batch; measure a marginal batch's cost against the fragmented
      // index, compact to the bucket layout's minimal files, measure
      // again — the delta is the read-amplification a cadence-driven
      // compaction (StreamingIngestDemo) claws back
      val filesFrag = spark.table(idx).inputFiles.length
      graft.streaming.LakehouseSink.compact(spark, idx, "bkey", 8)
      val filesComp = spark.table(idx).inputFiles.length
      val t3 = System.nanoTime()
      val nReplay2 =
        IncrementalDedup.indexBatch(spark, idx, batch(3)).count()
      val tReplay2 = (System.nanoTime() - t3) / 1e9
      require(nReplay2 == nReplay,
        "compaction changed the replay batch's candidate set")
      println(f"PROBE lsh_compaction          $filesFrag%d -> " +
        f"$filesComp%d files   marginal batch before: $tReplay%6.2f s" +
        f"   after: $tReplay2%6.2f s")
    }
    // Incremental IVF index: same story for embeddings — 4 arrival
    // batches vs assigning the corpus in one shot, plus the marginal
    // replay batch (anti-join finds nothing).
    {
      import graft.streaming.IncrementalAnn
      val idx = "scaleprobe_annidx"
      Seq(idx, s"${idx}_centroids")
        .foreach(graft.streaming.CdcMerge.dropStateTable(spark, _))
      val nVecs = embs1.count()
      val q = nVecs / 4
      def batch(i: Int) = embs1.filter(
        col("vec_id") >= i * q && (if (i == 3) lit(true)
          else col("vec_id") < (i + 1) * q))
      val t0 = System.nanoTime()
      (0 until 4).foreach(i =>
        IncrementalAnn.indexBatch(spark, idx, batch(i)))
      val tInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      IncrementalAnn.indexBatch(spark, idx, batch(3)) // replay
      val tReplay = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      SimilarityOps.rankedCellAssignments(embs1)
        .filter(col("rn") === 1).count()
      val tOne = (System.nanoTime() - t2) / 1e9
      val rows = spark.table(idx).count()
      println(f"PROBE incremental_ivf         4 batches/$nVecs%d vecs: " +
        f"$tInc%6.2f s ($rows%d indexed)   one-shot assign: $tOne%6.2f s" +
        f"   replay batch: $tReplay%6.2f s")
    }

    // round-9 additions: the Hamming scan and DSIR weighting must
    // track input size (pure scans + bounded aggregates), farthest-
    // first is k-1 scans regardless of n
    probe("binary_hamming") (
      SimilarityOps.binaryHammingRerank(embs1),
      SimilarityOps.binaryHammingRerank(embs4))
    probe("dsir_weights") (
      graft.operators.CurationOps.dsirWeights(docs1, "src0"),
      graft.operators.CurationOps.dsirWeights(docs4, "src0"))
    probe("farthest_seeds_k8") (
      graft.operators.CurationOps.farthestFirstSeeds(embs1),
      graft.operators.CurationOps.farthestFirstSeeds(embs4))

    // balanced assignment: the point is the BALANCE, not the time —
    // report max/mean cell load unbounded vs capacity-bounded
    {
      val nVecs = embs1.count()
      val cap = (nVecs + 7) / 8 + 1
      def loadStats(df: DataFrame, cidCol: String): (Long, Double) = {
        val loads = df.groupBy(col(cidCol)).count()
          .agg(max("count"), avg("count")).head()
        (loads.getLong(0), loads.getDouble(1))
      }
      val (maxU, avgU) = loadStats(
        SimilarityOps.rankedCellAssignments(embs1)
          .filter(col("rn") === 1), "cid")
      val (maxB, avgB) = loadStats(
        SimilarityOps.balancedAssign(embs1, capacity = cap), "cid")
      println(f"PROBE balanced_assign         unbounded max/avg: " +
        f"$maxU%d/$avgU%.1f   capacity=$cap%d max/avg: $maxB%d/$avgB%.1f" +
        f"   (skew ${maxU.toDouble / avgU}%.2f -> ${maxB.toDouble / avgB}%.2f)")
    }
    spark.stop()
  }
}
