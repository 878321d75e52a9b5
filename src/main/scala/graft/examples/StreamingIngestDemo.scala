package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sources.Tables
import graft.streaming.{CdcMerge, IncrementalCC, IncrementalDedup,
  IncrementalDsir, QualityGate}

/** Streaming corpus INGEST pipeline — the composed end-to-end path a
  * continuously-crawled training corpus runs on every arrival batch:
  *
  *   raw docs → [[QualityGate]] (Gopher-rule split, rejects keep
  *   per-rule audit) → [[IncrementalDedup]] (O(batch) LSH index
  *   probe; candidates Jaccard-verified) → accepted corpus table,
  *   near-dup pair log, reject table
  *   → [[IncrementalCC]] (pair batches fold into the standing
  *   near-dup CLUSTER labels — what keeps leakage-safe splits fresh)
  *   → [[IncrementalDsir]] (accepted batches fold into the DSIR
  *   bucket counts — selection weights stay current without a corpus
  *   re-profile).
  *
  * Everything is the library's incremental operators, so per-batch
  * work scales with the batch (plus true collisions), never with the
  * corpus — the property that lets the same pipeline run at 100 TB.
  *
  * Usage: sbt "runMain graft.examples.StreamingIngestDemo [sfDir]"
  */
object StreamingIngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val compactEvery = 2 // maintenance cadence, in micro-batches
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-streaming-ingest-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Seq("ingest_ok", "ingest_rej", "ingest_lshidx", "ingest_pairs",
        "ingest_cclabels", "ingest_cclabels_stage",
        "ingest_cclabels_cidx", "ingest_cclabels_cidx_stage",
        "ingest_dsir",
        "ingest_dsir_stage", "ingest_dsir_old", "ingest_cms",
        "ingest_cms_stage", "ingest_cms_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

    // stage the docs as four arrival files; stream them as micro-batches
    val src = Files.createTempDirectory("ingest-src").toString
    val docs = Tables.load(spark, sfDir, "documents")
    (0 until 4).foreach { i =>
      docs.filter(pmod($"doc_id", lit(4)) === i)
        .coalesce(1).write.parquet(s"$src/arrival$i")
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)

    // per micro-batch: quality split, then LSH-index the accepted docs
    // and log the verified near-dup pairs this batch introduced
    val ck = Files.createTempDirectory("ingest-ck").toString
    val q = stream.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // everything in the loop runs on the BATCH's session — the
        // writes land there, so reads through the long-lived outer
        // session would serve a stale cached listing from batch 0
        val bs = batch.sparkSession
        val (ok, rej) = QualityGate.split(batch, minTokens = 20)
        graft.operators.SchemaDrift.writeBatchIdempotent(
          ok, "ingest_ok", id)
        graft.operators.SchemaDrift.writeBatchIdempotent(
          rej, "ingest_rej", id)
        val cands = IncrementalDedup.indexBatch(
          bs, "ingest_lshidx", ok)
        bs.catalog.refreshTable("ingest_ok")
        val verified = DedupOps.verifyPairs(
          DedupOps.docShingles(bs.table("ingest_ok")), cands,
          minJ = 0.2)
        graft.operators.SchemaDrift.writeBatchIdempotent(
          verified, "ingest_pairs", id)
        // derived state, maintained from the SAME batch: the pair
        // batch folds into the standing cluster labels (leakage-safe
        // splits read these), the accepted docs into the DSIR bucket
        // counts (selection weights read those) — both O(batch),
        // both watermark-idempotent under redelivery
        IncrementalCC.applyBatch(bs, "ingest_cclabels",
          verified.select("doc_a", "doc_b"), id)
        IncrementalDsir.applyBatch(bs, "ingest_dsir", ok, "src0", id)
        // ... and the accepted words into the Count-Min frequency
        // grid (the vocabulary heavy-hitter monitor — d·w cells
        // forever, whatever the stream volume)
        graft.streaming.IncrementalCms.applyBatch(bs, "ingest_cms",
          ok.select(explode(split(trim(col("text")), " ")).as("word"))
            .filter(length(col("word")) > 0), "word", id)
        // maintenance CADENCE: the band index accretes one file set
        // per batch; every `compactEvery` batches rewrite it to the
        // bucket layout's minimal file count so probe read-amp stays
        // flat over an unbounded stream (run end measures the knee).
        // foreachBatch is sequential, so the staged rewrite's
        // single-writer contract holds by construction.
        if ((id + 1) % compactEvery == 0) {
          val before = bs.table("ingest_lshidx").inputFiles.length
          graft.streaming.LakehouseSink.compact(
            bs, "ingest_lshidx", "bkey", 8)
          val after = bs.table("ingest_lshidx").inputFiles.length
          println(s"[ingest] batch $id cadence compaction: " +
            s"$before -> $after files")
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val nOk = spark.table("ingest_ok").count()
    val nRej = spark.table("ingest_rej").count()
    val nPairs = spark.table("ingest_pairs")
      .select("doc_a", "doc_b").distinct().count()
    println(s"[ingest] accepted=$nOk rejected=$nRej nearDupPairs=$nPairs")
    require(nOk + nRej == docs.count(), "gate lost documents")

    // derived-state checks: incrementally-maintained labels must equal
    // a one-shot CC over the full pair log, and the maintained DSIR
    // weights must equal a one-shot profile of the accepted corpus —
    // the equivalences cdc28/doc32 pin against the DuckDB oracle,
    // re-asserted here on the composed streaming path.
    val labels = IncrementalCC.readLabels(spark, "ingest_cclabels")
    val oneShot = DedupOps.connectedComponents(
      spark.table("ingest_pairs").select("doc_a", "doc_b").distinct())
    require(labels.join(oneShot, Seq("doc_id", "component"))
      .count() == oneShot.count() && labels.count() == oneShot.count(),
      "incremental CC labels diverged from one-shot")
    val nClusters = labels.select("component").distinct().count()
    val w = IncrementalDsir.weightsFor(spark, "ingest_dsir",
      spark.table("ingest_ok"))
    val oneShotW = graft.operators.CurationOps.dsirWeights(
      spark.table("ingest_ok"), targetSource = "src0")
    require(w.exceptAll(oneShotW).isEmpty && oneShotW.exceptAll(w).isEmpty,
      "incremental DSIR weights diverged from one-shot")
    println(s"[ingest] clusters=$nClusters dsirWeightedDocs=${w.count()}")
    // maintained CMS grid == one-shot grid over the accepted corpus
    // (cells are sums — the cdc33 equivalence on the composed path)
    val okWords = spark.table("ingest_ok")
      .select(explode(split(trim(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val cmsInc = graft.streaming.IncrementalCms
      .readGrid(spark, "ingest_cms")
    val cmsOne = graft.operators.SketchOps.cmsGrid(okWords, "word")
    require(cmsInc.exceptAll(cmsOne).isEmpty &&
      cmsOne.exceptAll(cmsInc).isEmpty,
      "incremental CMS grid diverged from one-shot")
    println(s"[ingest] cmsCells=${cmsInc.count()}")

    // maintenance: streaming appends accrete one file set per batch on
    // the band index; periodic compaction rewrites it to minimal files
    // with the bucket layout (and its no-Exchange probes) intact
    val idxRows = spark.table("ingest_lshidx").count()
    val filesBefore = spark.table("ingest_lshidx").inputFiles.length
    graft.streaming.LakehouseSink.compact(
      spark, "ingest_lshidx", "bkey", 8)
    val filesAfter = spark.table("ingest_lshidx").inputFiles.length
    require(spark.table("ingest_lshidx").count() == idxRows,
      "compaction changed index contents")
    println(s"[ingest] index compaction: $filesBefore -> $filesAfter files")
    spark.stop()
  }
}
