package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Incrementally-maintained FRAME near-duplicate index — mm07's
  * frame-fingerprint dedup ([[MultimodalOps.frameNearDups]]) kept
  * current under media ingest: the re-cut/re-encoded rung of the
  * media-dedup ladder (cdc47 covers the whole-payload pHash rung),
  * where two videos match when they SHARE ≥ minMatch distinct frame
  * fingerprints.
  *
  * State: the frame postings (fprint, doc_id) as an APPEND grid
  * ([[AppendGrid]]) — rows immutable under document-disjoint ingest
  * (a payload's frame slices never change), fingerprint keys
  * hash-uniform, `_kb = pmod(xxhash64(fprint), nBuckets)`.
  *
  * THE DESIGN POINT (the containment lesson, applied from day one —
  * the r15 verdict's explicit instruction): mm07's df cap (kill
  * universal frames — black frames, boilerplate intros — before they
  * go quadratic) is a CORPUS-dependent statistic that DRIFTS as the
  * corpus grows: a fingerprint innocuous at batch 3 may be universal
  * by batch 300. So kept-ness is NEVER frozen at ingest — every serve
  * recounts df over the visible postings (for [[batchPairs]], over
  * key-restricted semi-joins: restricting keys does not restrict
  * owners, so the counts stay corpus-exact), exactly like
  * [[IncrementalContainment]]'s rarity. That also makes ERASURE free:
  * [[deleteDocs]] is a pure ledger append, and df / kept-ness /
  * match counts all fall out of the tombstone-aware read.
  *
  * Contract: document-disjoint append-only batches with monotone
  * batch ids; payloads shorter than one frame carry no postings.
  * Reference baseline: reference/stream_cdc has no media path — part
  * of the beyond-reference training-data surface (mm family). */
object IncrementalFrameDedup {

  private def wmTable(table: String) = s"${table}_wm"

  private val ParamsProp = "graft.frames"

  /** All tables the index maintains — for test/registration
    * cleanup. */
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

  private def requireParams(spark: SparkSession, table: String,
      frameBytes: Int, maxFrames: Int): Unit =
    CdcMerge.tableProp(spark, table, ParamsProp).foreach { s =>
      require(s == s"$frameBytes:$maxFrames",
        s"$table was built with frame parameters $s but the caller " +
          s"passed $frameBytes:$maxFrames (frameBytes:maxFrames are " +
          "fixed for the table's lifetime)")
    }

  private def batchPostings(media: DataFrame, frameBytes: Int,
      maxFrames: Int, nBuckets: Int): DataFrame =
    MultimodalOps.frameFingerprints(media, frameBytes, maxFrames)
      .withColumn("_kb",
        pmod(xxhash64(col("fprint")), lit(nBuckets.toLong)))

  /** Fold one media batch: one fingerprint pass over the batch's
    * bytes (∝ batch frames) + one append-shaped write. */
  def applyBatch(spark: SparkSession, table: String, media: DataFrame,
      batchId: Long, nBuckets: Int = 32, frameBytes: Int = 16,
      maxFrames: Int = 16): Unit = FoldTimer.timed {
    AppendGrid.recover(spark, table)
    if (batchId <= committed(spark, table)) return
    val deltas = batchPostings(media, frameBytes, maxFrames, nBuckets)
      .withColumn("_b", lit(batchId))
      .select(col("fprint"), col("doc_id"), col("_b"), col("_kb"))
    if (!spark.catalog.tableExists(table)) {
      CdcMerge.dropStateTable(spark, table)
      deltas.repartition(col("_kb"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_b", "_kb").saveAsTable(table)
      CdcMerge.setNBuckets(spark, table, nBuckets)
      CdcMerge.setTableProp(spark, table, ParamsProp,
        s"$frameBytes:$maxFrames")
    } else {
      CdcMerge.requireNBuckets(spark, table, nBuckets)
      requireParams(spark, table, frameBytes, maxFrames)
      AppendGrid.writeGeneration(spark, table, deltas, batchId,
        Seq("fprint", "doc_id"))
    }
    import spark.implicits._
    // monotone watermark: append-commit (TableSwap.appendCommit)
    TableSwap.appendCommit(spark, Seq(batchId).toDF("_batch"),
      wmTable(table))
  }

  /** ERASURE — ledger append ([[AppendGrid]]); every serve recounts
    * df over postings-minus-ledger, so kept-ness and match counts
    * land on the one-shot over corpus-minus-deleted for free (the
    * read-time-df design). O(ids); compaction physically reclaims;
    * re-ingestion serves new generations. */
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

  /** The committed postings (snapshot-consistent, erased docs
    * subtracted). Keeps `_kb` so [[batchPairs]] can prune. */
  private def servedPostings(spark: SparkSession,
      table: String): DataFrame = {
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    AppendGrid.resolvedLive(spark, table, "doc_id")
      .filter(col("_b") <= committed(spark, table))
      .select(col("fprint"), col("doc_id"), col("_kb"))
  }

  /** Asymmetric pair kernel for the per-batch serve: df-cap the
    * lookup's fingerprints AT READ TIME, equi-join probe×lookup on
    * the fingerprint, count DISTINCT shared kept fingerprints per
    * normalized pair — countDistinct, because a batch-batch pair
    * collides under both orderings while a batch-history pair
    * collides once (the pairsFromBanded normalization lesson). */
  private def pairsFrom(lookup: DataFrame, probe: DataFrame,
      minMatch: Int, maxDf: Int): DataFrame = {
    val kept = lookup.join(
      lookup.groupBy("fprint").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf).select("fprint"),
      Seq("fprint"))
    probe.select(col("fprint"), col("doc_id").as("pa"))
      .join(kept.select(col("fprint"), col("doc_id").as("pb")),
        Seq("fprint"))
      .filter(col("pa") =!= col("pb"))
      .groupBy(least(col("pa"), col("pb")).as("doc_a"),
        greatest(col("pa"), col("pb")).as("doc_b"))
      .agg(countDistinct(col("fprint")).as("n_match"))
      .filter(col("n_match") >= minMatch)
  }

  /** The full frame-near-dup report over the ingested corpus —
    * equals the one-shot mm07 exactly (cdc58 pins that through
    * redelivery + compaction + erasure). df recounted at read time
    * over the whole visible postings. */
  def report(spark: SparkSession, table: String, minMatch: Int = 3,
      maxDf: Int = 100): DataFrame = {
    // the symmetric case of the ONE pair kernel: probe == lookup (the
    // double ordering collapses under the normalized countDistinct,
    // and the df cap on the lookup side caps the equi-join whole)
    val postings = servedPostings(spark, table)
      .select("fprint", "doc_id")
    pairsFrom(postings, postings, minMatch, maxDf)
  }

  /** PER-BATCH SERVE: frame near-dup pairs involving `media` against
    * the WHOLE ingested corpus. Read ∝ the batch's fingerprints'
    * buckets: the grid prunes to the probe's `_kb` literals, the
    * probe is broadcast, and each fingerprint's df is GLOBAL-exact
    * because restricting KEYS (to the batch's fingerprints) never
    * restricts that key's OWNERS — every match-count only involves
    * shared fingerprints, which are by definition in the probe's key
    * set. Fold the batch first for batch∪history semantics. */
  def batchPairs(spark: SparkSession, table: String, media: DataFrame,
      minMatch: Int = 3, maxDf: Int = 100, frameBytes: Int = 16,
      maxFrames: Int = 16): DataFrame = {
    requireParams(spark, table, frameBytes, maxFrames)
    val nBuckets = CdcMerge.tableNBuckets(spark, table).getOrElse(32)
    val probe = batchPostings(media, frameBytes, maxFrames, nBuckets)
    // the batch's fingerprints and their buckets (batch-sized,
    // control-plane): the bucket list prunes PARTITIONS, the
    // fingerprint literals prune ROW-GROUPS (buckets are
    // fprint-sorted after compaction) and — the part that matters —
    // bound the df groupBy's SHUFFLE to matching rows. Restricting
    // the lookup to the probe's keys never restricts a key's OWNERS,
    // so per-key df stays global-exact; without it the hit buckets'
    // full row sets shuffled corpus-proportionally (measured 46 MB
    // for a 20-payload serve at 10x before this prune).
    val probeKeys = probe.select("fprint", "_kb").distinct()
      .collect()
    val kbs = probeKeys.map(_.getLong(1)).distinct.toSeq
    val fps = probeKeys.map(_.getLong(0)).distinct.toSeq
    val lookup = servedPostings(spark, table)
      .filter(col("_kb").isin(kbs: _*) && col("fprint").isin(fps: _*))
      .select("fprint", "doc_id")
    pairsFrom(lookup,
      broadcast(probe.select("fprint", "doc_id")), minMatch, maxDf)
  }

  private def restamp(df: DataFrame, b: Long): DataFrame = {
    val cols = df.columns
    df.withColumn("_b", lit(b)).select(cols.toSeq.map(col): _*)
  }

  /** Whole-grid compaction — identity re-stamp (immutable rows),
    * fingerprint-sorted buckets, tombstones physically reclaimed. */
  def compact(spark: SparkSession, table: String): Unit = {
    AppendGrid.compact(spark, table, restamp,
      sortCols = Seq("fprint"), delKey = Some("doc_id"))
    ()
  }

  /** Incremental per-bucket compaction — cost ∝ fragmented buckets. */
  def compactBuckets(spark: SparkSession, table: String,
      minParts: Int = 4): Seq[Long] =
    AppendGrid.compactBuckets(spark, table, restamp,
      dataCols = Seq("fprint", "doc_id"),
      sortCols = Seq("fprint"), minParts = minParts,
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
        applyBatch(batch.sparkSession, table, batch, batchId, nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
