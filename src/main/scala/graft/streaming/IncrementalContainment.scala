package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incrementally-maintained CONTAINMENT INDEX — doc36's near-superset
  * detection ([[DedupOps.containmentPairs]]: rare-shingle inverted
  * index + lossless PPJoin prefix filter) kept current under document
  * ingest. The failure a one-shot leaves open: a LATE-ARRIVING
  * superset of an early document (a syndication, a quote-expansion, a
  * contaminated eval question embedded in a later crawl) is invisible
  * until a full corpus re-run. The maintained index answers "which
  * containment pairs does THIS batch create against the whole
  * history" per batch ([[batchPairs]]), and reproduces the full
  * one-shot report on demand ([[report]]).
  *
  * State: the (shingle, doc_id) postings grid — DISTINCT per doc (the
  * docWordGrams unit), rows IMMUTABLE under document-disjoint ingest,
  * shingle keys near-uniform (w-gram hashes of open-vocabulary text) —
  * the APPEND pattern ([[IncrementalSpans]]' doctrine): each fold
  * writes its own `_b` generation, `_kb = pmod(xxhash64(shingle),
  * nBuckets)`, 1-row batch watermark, [[compact]]/[[compactBuckets]]
  * on cadence. HONESTY: the grid is corpus-token-sized, like the span
  * grid — it IS the inverted index a decontamination service stores.
  *
  * Why serve-time df, not a maintained prefix table: which shingles
  * are "rare" (df ≤ maxDf) DRIFTS as the corpus grows, and a doc's
  * prefix is chosen by df ORDER over its kept set — freezing prefixes
  * at ingest time silently breaks the lossless-filter guarantee once
  * a frozen prefix member goes common (the kept set shrinks, the
  * required prefix length is over a DIFFERENT n). So reads recompute
  * df exactly — but only for the shingle keys the read touches
  * (global counts via key-restricted semi-joins: restricting keys
  * does not restrict owners, so the counts stay corpus-exact).
  *
  * Contract: document-disjoint append-only batches, monotone batch
  * ids; changed-text redelivery is out of contract (stale postings
  * would persist). */
object IncrementalContainment {

  private def wmTable(table: String) = s"${table}_wm"

  private val WProp = "graft.shinglew"

  private def requireW(spark: SparkSession, table: String,
      w: Int): Unit =
    CdcMerge.tableProp(spark, table, WProp).foreach { s =>
      require(s.toInt == w,
        s"$table was built with shingleW=$s but the caller passed " +
          s"shingleW=$w; the shingle width is fixed for the table's " +
          "lifetime — rebuild the index to change it")
    }

  /** All tables the index maintains — for test/registration
    * cleanup. */
  def tables(table: String): Seq[String] =
    Seq(table, s"${table}_compacting", s"${table}_old",
      wmTable(table), s"${wmTable(table)}_stage",
      s"${wmTable(table)}_old")

  private def committedBatch(spark: SparkSession,
      table: String): Long = {
    val wm = wmTable(table)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (!spark.catalog.tableExists(wm)) -1L
    else spark.table(wm).agg(coalesce(max("_batch"), lit(-1L)))
      .collect()(0).getLong(0)
  }

  /** Fold one document batch: one shingle explosion (∝ batch tokens)
    * + one append-shaped write into the batch's own `_b` generation. */
  def applyBatch(spark: SparkSession, table: String,
      batchDocs: DataFrame, batchId: Long, shingleW: Int = 3,
      nBuckets: Int = 32): Unit = FoldTimer.timed {
    AppendGrid.recover(spark, table)
    if (batchId <= committedBatch(spark, table)) return
    val deltas = DedupOps.docWordGrams(batchDocs, shingleW)
      .select(col("shingle"), col("doc_id"))
      .withColumn("_b", lit(batchId))
      .withColumn("_kb",
        pmod(xxhash64(col("shingle")), lit(nBuckets.toLong)))
    if (!spark.catalog.tableExists(table)) {
      CdcMerge.dropStateTable(spark, table)
      deltas.repartition(col("_kb"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_b", "_kb").saveAsTable(table)
      CdcMerge.setNBuckets(spark, table, nBuckets)
      CdcMerge.setTableProp(spark, table, WProp, shingleW.toString)
    } else {
      CdcMerge.requireNBuckets(spark, table, nBuckets)
      requireW(spark, table, shingleW)
      AppendGrid.writeGeneration(spark, table, deltas, batchId,
        Seq("shingle", "doc_id"))
    }
    import spark.implicits._
    TableSwap.writeStaged(spark, Seq(batchId).toDF("_batch"),
      wmTable(table))
  }

  /** The committed postings (snapshot-consistent, bucket-compaction
    * resolved). */
  private def committedPostings(spark: SparkSession,
      table: String): DataFrame = {
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    AppendGrid.resolved(spark, table)
      .filter(col("_b") <= committedBatch(spark, table))
      .select("shingle", "doc_id")
  }

  /** The FULL doc36 report served from the grid: identical semantics
    * to [[DedupOps.containmentPairs]] over the ingested corpus (cdc45
    * pins that equality through the doc36 oracle). df here is the
    * postings row count per shingle — exact, because (shingle,
    * doc_id) is the grid's primary key. Corpus-sized by design (so is
    * the one-shot); the per-batch serving surface is
    * [[batchPairs]]. */
  def report(spark: SparkSession, table: String,
      minContain: Double = 0.8, minShingles: Int = 3,
      maxDf: Long = 100L): DataFrame = {
    val minPpm = (minContain * 1000000).round
    val sh0 = committedPostings(spark, table)
    val dfreq = sh0.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val sh = sh0.join(dfreq, Seq("shingle"))
    DedupOps.containmentFromKept(sh, minPpm, minShingles)
  }

  /** PER-BATCH SERVE: every containment pair INVOLVING `batchDocs`
    * (either side — the new doc contained in history, or a history
    * doc contained in the new near-superset) against the WHOLE
    * committed corpus, exactly equal to [[report]] restricted to
    * those pairs. Fold the batch before serving it (the keywordView
    * contract: the statistics must include the batch).
    *
    * Cost shape, each step key- or doc-restricted before it
    * aggregates:
    *  1. the batch's shingles' GLOBAL df (semi-join on the batch's
    *     keys — restricting keys, not owners, keeps counts exact);
    *     kept = df ≤ maxDf, so every kept batch shingle has ≤ maxDf
    *     postings;
    *  2. candidate docs = owners of kept batch shingles (≤ kept batch
    *     shingles × maxDf — the same bound doc36's prefix filter
    *     enjoys, applied from the batch side);
    *  3. the candidates' FULL posting rows (semi-join on doc_id) and
    *     their shingles' global df → kept rows for exactly the
    *     candidate set;
    *  4. the shared prefix-filter + verify pipeline over that set,
    *     filtered to pairs touching the batch.
    *
    * Soundness of the restriction: containment(a→b) ≥ t with
    * n_a ≥ minShingles forces ≥ ⌈t·minShingles⌉ ≥ 1 SHARED KEPT
    * shingles, so any qualifying pair touching the batch has both
    * docs in the candidate set; each candidate's kept rows and n are
    * complete (doc-restriction keeps all its shingles, df is global),
    * so prefix choice and verification match the full report's
    * exactly. */
  def batchPairs(spark: SparkSession, table: String,
      batchDocs: DataFrame, minContain: Double = 0.8,
      minShingles: Int = 3, maxDf: Long = 100L,
      shingleW: Int = 3): DataFrame = {
    requireW(spark, table, shingleW)
    val minPpm = (minContain * 1000000).round
    val grid = committedPostings(spark, table)
    val batchIds = batchDocs.select("doc_id").distinct()
    // every restriction set below is REQUEST-sized (batch shingles,
    // then ≤ batch-kept-shingles × maxDf candidates and their
    // postings' keys) — broadcast them EXPLICITLY: the sets come off
    // multi-step pipelines whose size Catalyst cannot estimate, and a
    // fallback sort-merge semi-join would shuffle the corpus-sized
    // grid per serve (measured: 0.14 MB → 511 MB shuffle at 10×
    // grid without the hints, flat 0.14 MB with them)
    val batchKeys = broadcast(
      DedupOps.docWordGrams(batchDocs, shingleW)
        .select("shingle").distinct())
    // (1) global df of the batch's shingles, kept only
    val dfBatch = grid.join(batchKeys, Seq("shingle"), "left_semi")
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // (2) owners of kept batch shingles = the candidate universe
    val candDocs = grid
      .join(broadcast(dfBatch.select("shingle")),
        Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
      .unionByName(batchIds).distinct()
    // (3) the candidates' full posting rows, with GLOBAL df per key
    val subGrid = grid.join(broadcast(candDocs), Seq("doc_id"),
      "left_semi")
    val keys = subGrid.select("shingle").distinct()
    val dfAll = grid.join(broadcast(keys), Seq("shingle"), "left_semi")
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val kept = subGrid.join(broadcast(dfAll), Seq("shingle"))
    // (4) shared pipeline, restricted to pairs touching the batch
    val ids = broadcast(batchIds)
    DedupOps.containmentFromKept(kept, minPpm, minShingles)
      .join(ids.select(col("doc_id").as("doc_a"))
          .withColumn("_hit_a", lit(1)),
        Seq("doc_a"), "left")
      .join(ids.select(col("doc_id").as("doc_b"))
          .withColumn("_hit_b", lit(1)),
        Seq("doc_b"), "left")
      .filter(col("_hit_a").isNotNull || col("_hit_b").isNotNull)
      .select("doc_a", "doc_b", "n_inter", "n_a", "containment_ppm")
  }

  /** Fold all generations into the newest one — shingle-sorted
    * buckets, identity re-stamp (rows immutable). */
  def compact(spark: SparkSession, table: String): Unit = {
    AppendGrid.compact(spark, table, (grid, maxB) => {
      val cols = grid.columns
      grid.withColumn("_b", lit(maxB)).select(cols.toSeq.map(col): _*)
    }, sortCols = Seq("shingle"))
    ()
  }

  /** INCREMENTAL compaction ([[AppendGrid.compactBuckets]]). */
  def compactBuckets(spark: SparkSession, table: String,
      minParts: Int = 4): Seq[Long] =
    AppendGrid.compactBuckets(spark, table, (live, fence) => {
      val cols = live.columns
      live.withColumn("_b", lit(fence)).select(cols.toSeq.map(col): _*)
    }, dataCols = Seq("shingle", "doc_id"),
      sortCols = Seq("shingle"), minParts = minParts)

  /** Continuous maintenance: foreachBatch [[applyBatch]] under the
    * stream's own monotone batch ids. */
  def startIngestStream(df: DataFrame, table: String,
      checkpointDir: String, shingleW: Int = 3, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId,
          shingleW, nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
