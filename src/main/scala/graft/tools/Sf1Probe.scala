package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** sf1 scale probe: the driver's testdata stops at sf0.1, but the
  * dedup/ANN/merge knees the 100 TB design cares about (LSH candidate
  * volume, IVF cell skew, merge touched-partition count) only show
  * their bend beyond it. This tool materializes a DERIVED sf1-scale
  * corpus (10× sf0.1) under /tmp — a probe input only, never an
  * oracle input — and times the four operators the r6 verdict named
  * (doc04, doc25, emb05, cdc16) at sf0.1 vs sf1, printing the knee
  * indicators next to wall time. Results land in SCALE.md.
  *
  * Derivation (deterministic, no RNG):
  *  - documents ×10: replica `i` suffixes every token with `_i`, so
  *    replicas share NO shingles with each other or the original
  *    (vocabulary grows 10× — corpus growth by new domains, not by
  *    exploding dup cliques, which the 4× twin probe already covers)
  *    while each replica preserves the generator's internal dup
  *    structure: verified pairs and candidate volume scale ~linearly
  *    in a healthy index.
  *  - embeddings ×10: replica `i` adds a small per-dimension
  *    deterministic jitter, keeping the cell geometry (and therefore
  *    IVF skew) comparable while making replicas distinct vectors.
  *  - events ×10: replica `i` shifts event ids and the user_id KEY
  *    SPACE, so merge state grows 10× and per-batch touched-bucket
  *    counts are measured against a 10×-key table.
  *
  * Usage: sbt "runMain graft.tools.Sf1Probe [sfDir] [outDir]"
  */
object Sf1Probe {
  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    generateIfMissing(spark, sfDir, outDir)

    println(s"== sf0.1 ($sfDir) ==")
    probeAll(spark, sfDir)
    println(s"== sf1 ($outDir) ==")
    probeAll(spark, outDir)
    spark.stop()
  }

  private[tools] def generateIfMissing(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    if (Files.exists(Paths.get(s"$outDir/documents.parquet"))) return
    println(s"[sf1] generating derived corpus under $outDir ...")
    val docs = Tables.load(spark, sfDir, "documents")
    (0 until Replicas).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1_" + i))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = Tables.load(spark, sfDir, "embeddings")
    (0 until Replicas).map { i =>
      if (i == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L))
        .withColumn("embedding", transform(col("embedding"),
          (x, j) => (x + lit(0.003f * i) *
            (pmod(j, lit(5)) - lit(2)).cast("float")).cast("float")))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val events = Tables.load(spark, sfDir, "events")
    (0 until Replicas).map { i =>
      if (i == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println("[sf1] generation done")
  }

  private def probeAll(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val nDocs = docs.count()

    // doc04: LSH near-dup sweep. Knee indicator: candidate-pair volume
    // per document (a super-linear ratio means band keys are
    // degenerating into hot buckets at this vocabulary size).
    {
      val t0 = System.nanoTime()
      val nCand = DedupOps.lshCandidates(DedupOps.lshBands(
        DedupOps.minhashSignature(docs))).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      DedupOps.unpersistShingleCaches(blocking = true)
      val t1 = System.nanoTime()
      val nVer = DedupOps.verifiedNearDups(docs).count()
      val tVer = (System.nanoTime() - t1) / 1e9
      DedupOps.unpersistShingleCaches(blocking = true)
      println(f"PROBE doc04_lsh        $nDocs%8d docs  candidates: " +
        f"$nCand%7d (${nCand.toDouble / nDocs}%.3f/doc, $tCand%6.1f s)" +
        f"  verified: $nVer%6d ($tVer%6.1f s)")
    }

    // doc25: incremental LSH — marginal cost of ONE batch against the
    // full index. Knee indicator: marginal-batch seconds vs corpus
    // size (flat = per-arrival dedup affordable at any corpus size).
    {
      import graft.streaming.IncrementalDedup
      val idx = "sf1probe_lshidx"
      graft.streaming.CdcMerge.dropStateTable(spark, idx)
      def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === i)
      val t0 = System.nanoTime()
      (0 until 3).foreach(i =>
        IncrementalDedup.indexBatch(spark, idx, batch(i)).count())
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nMarg = IncrementalDedup.indexBatch(spark, idx, batch(3)).count()
      val tMarg = (System.nanoTime() - t1) / 1e9
      DedupOps.unpersistShingleCaches(blocking = true)
      println(f"PROBE doc25_inc_lsh    3-batch build: $tBuild%6.1f s   " +
        f"marginal batch: $tMarg%6.1f s / $nMarg%d cands")
      graft.streaming.CdcMerge.dropStateTable(spark, idx)
    }

    // emb05: IVF multi-probe ANN. Knee indicator: cell-size skew
    // (max/mean) — a hot cell turns the probed scan into a straggler.
    {
      val t0 = System.nanoTime()
      val n = SimilarityOps.ivfTopKProbed(embs, nProbe = 2).count()
      val t = (System.nanoTime() - t0) / 1e9
      val sizes = SimilarityOps.rankedCellAssignments(embs)
        .filter(col("rn") === 1)
        .groupBy("cid").count().select("count")
        .collect().map(_.getLong(0))
      val skew = sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
      println(f"PROBE emb05_ivf        ${embs.count()}%8d vecs  " +
        f"top-k: $n%4d rows ($t%6.1f s)   cell skew max/mean: " +
        f"$skew%.2f over ${sizes.length}%d cells")
    }

    // cdc16: bucketed merge. Knee indicator: touched-bucket fraction
    // per batch — the merge rewrite cost is ∝ touched partitions, so
    // the probe reports how many of the table's buckets a batch hits
    // at this key density (64 buckets: sf0.1 batches already touch
    // all; the number that matters at 100 TB is per-bucket ROWS,
    // which stays ∝ batch by the hash spread).
    {
      import graft.operators.CdcOps
      import graft.streaming.CdcMerge
      val table = "sf1probe_state"
      CdcMerge.dropStateTable(spark, table)
      CdcMerge.dropStateTable(spark, s"${table}_stage")
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events))
      val nBuckets = 64
      def part(i: Int) = env.filter(pmod(col("event_id"), lit(3)) === i)
      val t0 = System.nanoTime()
      (0 until 3).foreach { i =>
        CdcMerge.applyBatch(spark, table, part(i), "user_id",
          Seq("ts", "event_id"), nBuckets = nBuckets)
      }
      val tAll = (System.nanoTime() - t0) / 1e9
      val touched = part(2)
        .select(pmod(xxhash64(col("user_id")), lit(nBuckets)).as("kb"))
        .distinct().count()
      val stateRows = CdcMerge.readState(spark, table).count()
      println(f"PROBE cdc16_merge      3 batches: $tAll%6.1f s   " +
        f"state rows: $stateRows%d   batch touches $touched%d/" +
        f"$nBuckets%d buckets")
      CdcMerge.dropStateTable(spark, table)
    }
  }
}
