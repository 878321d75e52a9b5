package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Incrementally-maintained MEDIA near-duplicate index — mm06's
  * banded-pHash dedup ([[MultimodalOps.mediaNearDups]]) kept current
  * under media ingest, so each arriving batch of payloads is checked
  * against the WHOLE corpus without recomputing a single historical
  * pHash: the image/audio dedup gate of a streaming multimodal
  * curation pipeline. The text sibling is [[IncrementalDedup]]
  * (doc25); this is the same doctrine over the binary column.
  *
  * State: the banded pHash postings (band, key, doc_id, phash) as an
  * APPEND grid ([[AppendGrid]]) — rows are IMMUTABLE under the
  * document-disjoint contract (a payload's pHash never changes), and
  * band keys are near-uniform hash slices, so a merge-shaped bucketed
  * table would rewrite every bucket per fold (the cdc40 finding).
  * Each fold appends its batch's postings into its own `_b`
  * generation via the conf-free static-prefix overwrite (idempotent
  * through the crash window); the 1-row watermark fences every serve;
  * [[compactBuckets]] folds fragmented buckets on cadence (identity
  * re-stamp — immutable rows need no algebra, just fewer files).
  *
  * Serving:
  *  - [[report]] — the full near-dup pair set over the ingested
  *    corpus; equals the one-shot mm06 exactly (cdc47 pins that
  *    through a redelivered batch and a mid-stream compaction). The
  *    join is postings-sized — the honest full-corpus request; the
  *    maintained win is that no media byte is ever re-scanned.
  *  - [[batchPairs]] — the per-batch serve: candidates of ONE batch
  *    against the whole corpus, read cost ∝ the batch's band keys'
  *    buckets (bucket-literal pruning + the probe broadcast). This is
  *    what the ingest gate actually calls, and what the one-shot
  *    cannot do without a full recompute.
  *
  * Contract: document-disjoint append-only batches with monotone
  * batch ids (a payload re-arriving with changed bytes is out of
  * contract — its old postings would persist). Payloads shorter than
  * `gram` bytes carry no signal and are excluded, exactly as in the
  * one-shot ([[MultimodalOps.mediaSimhash]]).
  *
  * Reference baseline: the banding/Hamming recipe is the public
  * image-dedup standard (SimHash over content grams; cf.
  * `reference/stream_cdc` has no media path — this is part of the
  * beyond-reference training-data surface). */
object IncrementalMediaDedup {

  private def wmTable(table: String) = s"${table}_wm"

  /** All tables the index maintains — for test/registration cleanup. */
  def tables(table: String): Seq[String] =
    Seq(table, s"${table}_compacting", s"${table}_old",
      AppendGrid.delsTable(table),
      wmTable(table), s"${wmTable(table)}_stage",
      s"${wmTable(table)}_old")

  private def committed(spark: SparkSession, table: String): Long = {
    val wm = wmTable(table)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (!spark.catalog.tableExists(wm)) -1L
    else spark.table(wm)
      .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
  }

  /** Serve paths take the hash parameters as arguments like the
    * one-shot does, but the STORED postings were hashed with the
    * parameters pinned at table creation — a drifted caller would
    * silently recompute probe hashes in a disjoint keyspace (zero
    * collisions, no error anywhere) or band with a different
    * pigeonhole bound. Fail fast instead (the write-path
    * `graft.phash` discipline, applied to reads — the r15 advice). */
  private def requirePhash(spark: SparkSession, table: String,
      gram: Int, bits: Int, bands: Int): Unit =
    CdcMerge.tableProp(spark, table, "graft.phash").foreach { s =>
      require(s == s"$gram:$bits:$bands",
        s"$table was built with phash parameters $s but the serve " +
          s"was called with $gram:$bits:$bands " +
          "(gram:bits:bands are fixed for the table's lifetime)")
    }

  private def bandedBatch(media: DataFrame, gram: Int, bits: Int,
      bands: Int, nBuckets: Int): DataFrame =
    MultimodalOps.bandedPhash(media, gram, bits, bands)
      .withColumn("_kb",
        pmod(xxhash64(col("band"), col("key")), lit(nBuckets.toLong)))

  /** Fold one media batch: one pHash pass over the batch's bytes
    * (∝ batch grams) + one append-shaped postings write (∝ batch ×
    * bands). `nBuckets` and the hash parameters are fixed for the
    * table's lifetime (recorded as graft.* properties, drift fails
    * fast). */
  def applyBatch(spark: SparkSession, table: String, media: DataFrame,
      batchId: Long, nBuckets: Int = 32, gram: Int = 4,
      bits: Int = 32, bands: Int = 4): Unit = FoldTimer.timed {
    AppendGrid.recover(spark, table)
    if (batchId <= committed(spark, table)) return
    val deltas = bandedBatch(media, gram, bits, bands, nBuckets)
      .withColumn("_b", lit(batchId))
      .select(col("band"), col("key"), col("doc_id"), col("phash"),
        col("_b"), col("_kb"))
    if (!spark.catalog.tableExists(table)) {
      CdcMerge.dropStateTable(spark, table)
      deltas.repartition(col("_kb"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_b", "_kb").saveAsTable(table)
      CdcMerge.setNBuckets(spark, table, nBuckets)
      CdcMerge.setTableProp(spark, table, "graft.phash",
        s"$gram:$bits:$bands")
    } else {
      CdcMerge.requireNBuckets(spark, table, nBuckets)
      require(CdcMerge.tableProp(spark, table, "graft.phash")
        .forall(_ == s"$gram:$bits:$bands"),
        s"$table was built with different pHash parameters " +
          "(gram:bits:bands are fixed for the table's lifetime)")
      AppendGrid.writeGeneration(spark, table, deltas, batchId,
        Seq("band", "key", "doc_id", "phash"))
    }
    import spark.implicits._
    // monotone watermark: append-commit (TableSwap.appendCommit)
    TableSwap.appendCommit(spark, Seq(batchId).toDF("_batch"),
      wmTable(table))
  }

  /** ERASURE — tombstone the given media docs out of the postings
    * (the [[AppendGrid]] ledger): every serve reads
    * postings-minus-ledger, so pair reports and per-batch lookups
    * land exactly on the one-shot over corpus-minus-deleted (cdc56
    * pins that). Pure ledger append — O(ids), no grid read (an
    * absent doc's tombstone is inert). Compaction physically
    * reclaims; a payload re-ingested later serves its new
    * generations. Idempotent; single-writer. */
  def deleteDocs(spark: SparkSession, table: String,
      ids: DataFrame): Unit = {
    AppendGrid.recover(spark, table)
    val wmB = committed(spark, table)
    if (wmB < 0) return
    // erasure fence: an in-flight fold's redelivery would land above
    // the tombstones and escape them
    AppendGrid.requireAllCommitted(spark, table, wmB)
    AppendGrid.appendDels(spark, table, ids.select("doc_id"),
      "doc_id", wmB)
  }

  /** The committed postings (snapshot-consistent: generations above
    * the watermark — an open crash window — are invisible; erased
    * docs subtracted). */
  private def servedPostings(spark: SparkSession,
      table: String): DataFrame = {
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    AppendGrid.resolvedLive(spark, table, "doc_id")
      .filter(col("_b") <= committed(spark, table))
      .select(col("doc_id"), col("phash"), col("band"), col("key"))
  }

  /** The full near-dup pair set over the ingested corpus — equals the
    * one-shot [[MultimodalOps.mediaNearDups]] exactly (same shared
    * pair kernel over the same postings). Postings-sized join, no
    * media bytes read. */
  def report(spark: SparkSession, table: String,
      maxHam: Int = 3, bands: Int = 4): DataFrame = {
    // bands must match the stored banding (the pigeonhole bound is
    // over the STORED band count); gram/bits ride the same property
    CdcMerge.tableProp(spark, table, "graft.phash").foreach { s =>
      require(s.split(":")(2).toInt == bands,
        s"$table was banded with bands=${s.split(":")(2)} but the " +
          s"serve passed bands=$bands")
    }
    MultimodalOps.pairsFromBanded(servedPostings(spark, table),
      maxHam, bands)
  }

  /** Per-batch candidate discovery: the near-dup pairs involving
    * `media`'s docs against the WHOLE ingested corpus (the batch
    * itself included if already folded — call after [[applyBatch]]
    * for batch∪history semantics, the [[IncrementalDedup.indexBatch]]
    * contract). Read cost ∝ the batch's band keys' buckets: the grid
    * scan prunes to the probe's `_kb` literals, and the batch-sized
    * probe side is broadcast EXPLICITLY (a multi-step-derived probe
    * defeats Catalyst's size estimate — the cdc45 finding). The
    * batch's pHashes are recomputed here (batch-sized, the serve's
    * honest cost); history is never re-hashed. */
  def batchPairs(spark: SparkSession, table: String, media: DataFrame,
      maxHam: Int = 3, gram: Int = 4, bits: Int = 32,
      bands: Int = 4): DataFrame = {
    requirePhash(spark, table, gram, bits, bands)
    val nBuckets = CdcMerge.tableNBuckets(spark, table).getOrElse(32)
    val probe = bandedBatch(media, gram, bits, bands, nBuckets)
    val kbs = probe.select("_kb").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lookup = servedPostingsForBuckets(spark, table, kbs)
    MultimodalOps.pairsFromBanded(
      broadcast(probe.select("doc_id", "phash", "band", "key")),
      maxHam, bands, lookup = Some(lookup))
  }

  /** [[servedPostings]] pruned to the given `_kb` buckets — lossless
    * for a probe whose band keys hash into exactly those buckets. */
  private def servedPostingsForBuckets(spark: SparkSession,
      table: String, kbs: Seq[Long]): DataFrame = {
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    AppendGrid.resolvedLive(spark, table, "doc_id")
      .filter(col("_b") <= committed(spark, table) &&
        col("_kb").isin(kbs: _*))
      .select(col("doc_id"), col("phash"), col("band"), col("key"))
  }

  /** Whole-grid compaction ([[AppendGrid.compact]]): identity
    * re-stamp — postings are immutable, compaction only merges
    * generations into one file per bucket. Key-sorted within each
    * bucket so point probes can skip row groups. */
  def compact(spark: SparkSession, table: String): Unit = {
    AppendGrid.compact(spark, table, (grid, maxB) =>
      grid.withColumn("_b", lit(maxB))
        .select(col("band"), col("key"), col("doc_id"), col("phash"),
          col("_b"), col("_kb")),
      sortCols = Seq("band", "key"), delKey = Some("doc_id"))
    ()
  }

  /** Incremental per-bucket compaction ([[AppendGrid.compactBuckets]]):
    * cost ∝ fragmented buckets, no rename window. */
  def compactBuckets(spark: SparkSession, table: String,
      minParts: Int = 4): Seq[Long] =
    AppendGrid.compactBuckets(spark, table, (live, fence) =>
      live.withColumn("_b", lit(fence))
        .select(col("band"), col("key"), col("doc_id"), col("phash"),
          col("_b"), col("_kb")),
      dataCols = Seq("band", "key", "doc_id", "phash"),
      sortCols = Seq("band", "key"), minParts = minParts,
      delKey = Some("doc_id"))

  /** Continuous maintenance: foreachBatch [[applyBatch]] under the
    * stream's own monotone batch ids. */
  def startIngestStream(df: DataFrame, table: String,
      checkpointDir: String, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // nBuckets forwarded (the r15 advice): dropping it here would
        // silently build a default-bucketed table on the first fold
        // (or fail fast against an existing one)
        applyBatch(batch.sparkSession, table, batch, batchId, nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
