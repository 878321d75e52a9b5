package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incremental MinHash/LSH dedup-index maintenance: keep the LSH
  * band-bucket index of an ever-growing corpus in a bucketed table and
  * process each NEW batch of documents against it — signatures are
  * computed for the batch only, and candidate pairs come from bucket
  * collisions of the batch's band rows against the index. This is the
  * operator that makes streaming-corpus dedup tractable at 100 TB: the
  * naive alternative recomputes the full corpus×corpus LSH sweep per
  * ingest batch, i.e. O(corpus) work for O(batch) new data.
  *
  * Design:
  *
  *  - The index table is (bkey, doc_id), BUCKETED on `bkey` (the
  *    band id fused into the band key string → a single-column join
  *    key). The per-batch candidate lookup joins batch bands against
  *    the index on `bkey`, and bucketing means the stored side reads
  *    WITHOUT an Exchange — the corpus-sized side of the join is never
  *    shuffled, batch after batch ([[LakehouseSink]]'s write-once
  *    shuffle contract).
  *  - Batch band rows are appended bucketed; per-bucket file count
  *    grows with batch count, so run [[LakehouseSink.compact]] on the
  *    index periodically, like any streaming-append table.
  *  - Replay-safe: band rows already present are anti-joined away, so
  *    a redelivered batch appends nothing and yields no candidates —
  *    at-least-once upstream converges to the exactly-once index.
  *  - New-new pairs within a batch collide in the same join (the batch
  *    rows are part of neither-yet-indexed; they are unioned into the
  *    lookup side), normalized to (doc_a < doc_b) and deduped.
  *
  * Verification of candidates (true Jaccard) stays work-proportional
  * to candidates via [[DedupOps.verifyPairs]] over the corpus shingle
  * view — candidates name WHICH old docs to re-read, so the verify
  * cost is ∝ collisions, not corpus.
  *
  * Known limitation: the stop-shingle df guard
  * ([[DedupOps.verifiedNearDupsFrom]]'s `maxDocFrac`) is a GLOBAL
  * statistic and cannot be applied exactly per batch — document
  * frequencies keep changing as the corpus accretes, so a shingle
  * innocuous at batch 3 may be universal by batch 300. For
  * high-collision units (char trigrams over small vocabularies),
  * treat the guard as a rebuild-time decision: periodically re-derive
  * the stop list offline and rebuild the index without those
  * shingles, like any index maintenance.
  */
object IncrementalDedup {

  /** The index's erasure ledger table name. */
  def delsTable(indexTable: String): String = s"${indexTable}_dels"

  /** ERASURE — remove the given docs from the candidate universe:
    * every later [[indexBatch]] lookup excludes their band rows, so
    * no future pair involves an erased doc (one-shot-over-
    * corpus-minus-deleted, cdc54 pins it). Mechanics differ from the
    * [[AppendGrid]] family because this index is BUCKETED, not
    * generation-partitioned — there is no `_b` to fence on, so the
    * ledger is a plain doc_id set maintained by [[TableSwap]] swaps:
    *  - delete = staged swap of (ledger ∪ ids) — O(ledger + ids),
    *    no index read;
    *  - RE-INSERTION = the un-delete half: [[indexBatch]] removes its
    *    batch's doc ids from the ledger before the lookup, so a doc
    *    re-ingested after erasure collides normally again (its band
    *    rows are already in the index — the anti-join append guard
    *    keeps them unique);
    *  - [[vacuum]] physically reclaims: one bucketed rewrite minus
    *    the ledger. The ledger itself is KEPT (the accumulated pair
    *    log still names erased docs and [[minusDeletedPairs]]
    *    subtracts through it); re-arrival via [[indexBatch]] is the
    *    only un-delete, and a reclaimed doc that re-arrives indexes
    *    as brand-new rows.
    * Idempotent; single-writer (pause the ingest stream). */
  def deleteDocs(spark: SparkSession, indexTable: String,
      ids: DataFrame): Unit = {
    val delsT = delsTable(indexTable)
    TableSwap.recover(spark, delsT, s"${delsT}_stage")
    val merged =
      if (!spark.catalog.tableExists(delsT)) ids.select("doc_id")
      else spark.table(delsT).select("doc_id")
        .unionByName(ids.select("doc_id"))
    TableSwap.writeStaged(spark, merged.distinct(), delsT)
  }

  /** The ledger as an exclusion frame (None before any delete). */
  private def dels(spark: SparkSession,
      indexTable: String): Option[DataFrame] = {
    val delsT = delsTable(indexTable)
    TableSwap.recover(spark, delsT, s"${delsT}_stage")
    if (!spark.catalog.tableExists(delsT)) None
    else Some(spark.table(delsT).select("doc_id"))
  }

  /** Physically reclaim erased docs' band rows: one staged bucketed
    * rewrite minus the ledger. Cost ∝ index (the honest price of
    * physical reclamation on a bucketed layout — run on compaction
    * cadence); serves are already exact without it through the ledger
    * exclusion. The LEDGER IS KEPT: consumers' accumulated pair logs
    * (the doc25 union-of-batches shape) still name erased docs, and
    * [[minusDeletedPairs]] subtracts through the ledger — clearing it
    * here would silently resurface those pairs after the vacuum.
    * Re-arrival stays the one un-delete path ([[indexBatch]] retires
    * its batch's ids); ledger rows for reclaimed-and-gone docs are a
    * slim row each. The bucket count comes from the INDEX'S OWN
    * catalog bucket spec, never a caller parameter — a mismatched
    * default would silently rebucket the table (the r15 serve-param
    * advice, applied to the maintenance path). Crash-safe: the staged
    * rewrite is the only mutation. */
  def vacuum(spark: SparkSession, indexTable: String): Unit = {
    dels(spark, indexTable) match {
      case None => ()
      case Some(d) =>
        spark.catalog.refreshTable(indexTable)
        val nBuckets = spark.sessionState.catalog
          .getTableMetadata(spark.sessionState.sqlParser
            .parseTableIdentifier(indexTable))
          .bucketSpec.map(_.numBuckets).getOrElse(8)
        val kept = spark.table(indexTable)
          .join(broadcast(d), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        LakehouseSink.stagedRewrite(spark, indexTable,
          s"${indexTable}_compacting") { tmp =>
          LakehouseSink.writeBucketed(kept, tmp, "bkey", nBuckets)
        }
    }
  }

  /** Serve-side erasure filter for the accumulated PAIR LOG: pairs
    * recorded before a delete still name erased docs — a consumer
    * reading the log (the doc25 union-of-batches shape) drops every
    * pair touching the CURRENT ledger. Pass-through before any
    * delete. `pairs` must carry (doc_a, doc_b). */
  def minusDeletedPairs(spark: SparkSession, indexTable: String,
      pairs: DataFrame): DataFrame =
    dels(spark, indexTable) match {
      case None => pairs
      case Some(d) =>
        val da = broadcast(d.select(col("doc_id").as("doc_a")))
        val db = broadcast(d.select(col("doc_id").as("doc_b")))
        pairs.join(da, Seq("doc_a"), "left_anti")
          .join(db, Seq("doc_b"), "left_anti")
    }

  /** The batch's LSH band rows as (bkey, doc_id). */
  def bandRows(batchDocs: DataFrame, k: Int = 8,
      rowsPerBand: Int = 2): DataFrame =
    DedupOps.lshBands(DedupOps.minhashSignature(batchDocs, k), k,
        rowsPerBand)
      .select(concat(col("band").cast("string"), lit(":"), col("key"))
        .as("bkey"), col("doc_id"))

  /** Index one batch: append its new band rows to `indexTable` and
    * return the batch's candidate pairs (batch×indexed ∪ batch×batch),
    * normalized (doc_a < doc_b) and distinct.
    *
    * The pair set is computed from the batch's FULL band rows (not
    * just the not-yet-indexed ones), so the RETURN VALUE is
    * idempotent under at-least-once replay: if a crash lands between
    * the index append and the caller persisting the pairs, the
    * replayed batch returns the SAME pair set again (its rows are in
    * the index by then, and self-collisions are filtered) — paired
    * with an idempotent `_batch_id` write
    * ([[graft.operators.SchemaDrift.writeBatchIdempotent]]) the pair
    * log converges exactly. Only genuinely-new band rows are
    * appended, so the index itself never duplicates. The returned
    * frame is MATERIALIZED (localCheckpoint) before the append so it
    * cannot double-count its own batch's rows through the table. */
  def indexBatch(spark: SparkSession, indexTable: String,
      batchDocs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      nBuckets: Int = 8): DataFrame = FoldTimer.timed {
    // ALL reads and writes go through the BATCH's own session: under
    // foreachBatch the batch frame belongs to a cloned session, and
    // mixing it with a long-lived outer `spark` splits the call
    // across two relation caches — the writes (which always run on
    // the batch's session) would never invalidate the outer session's
    // cached index listing, and from the second batch on the lookup
    // side silently misses everything previously appended. The
    // refresh additionally guards against OTHER sessions appending to
    // the same index between calls. The require makes that pinning
    // contract explicit instead of silently ignoring a mismatched
    // `spark` argument.
    require(spark eq batchDocs.sparkSession,
      s"indexBatch($indexTable): `spark` must be the batch's own " +
        "session (all reads/writes are pinned to batchDocs.sparkSession)")
    val s = batchDocs.sparkSession
    val bands = bandRows(batchDocs, k, rowsPerBand)
    if (!s.catalog.tableExists(indexTable)) {
      CdcMerge.dropStateTable(s, indexTable)
      LakehouseSink.writeBucketed(bands, indexTable, "bkey", nBuckets)
      return normalizedCollisions(
        s.table(indexTable), s.table(indexTable))
        .localCheckpoint(true)
    }
    s.catalog.refreshTable(indexTable)
    // erasure interplay, BEFORE the lookup: a re-arriving batch doc
    // UN-DELETES itself (the re-insertion half of [[deleteDocs]]'
    // contract — its band rows are still in the index, so collisions
    // resume immediately), and the surviving ledger keys are excluded
    // from the lookup side so no pair involves an erased doc
    val exclude = dels(s, indexTable) match {
      case None => None
      case Some(d) =>
        val batchIds = bands.select("doc_id").distinct()
        val kept = d.join(batchIds, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        if (kept.count() < d.count())
          TableSwap.writeStaged(s, kept, delsTable(indexTable))
        if (kept.isEmpty) None else Some(broadcast(kept))
    }
    def minusDels(df: DataFrame): DataFrame = exclude match {
      case None => df
      case Some(d) => df.join(d, Seq("doc_id"), "left_anti")
    }
    val fresh = bands
      .join(s.table(indexTable), Seq("bkey", "doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lookup = minusDels(s.table(indexTable)).unionByName(fresh)
      val pairs = normalizedCollisions(bands, lookup)
        .localCheckpoint(true) // materialize BEFORE the append below
      LakehouseSink.writeBucketed(fresh, indexTable, "bkey", nBuckets,
        mode = "append")
      pairs
    } finally fresh.unpersist()
  }

  /** Continuous indexing: foreachBatch [[indexBatch]] over a streaming
    * document DataFrame, with each batch's candidate pairs logged to
    * `pairsTable` under its `_batch_id` (static-overwrite idempotent
    * — with [[indexBatch]]'s replay-idempotent pair set, the log
    * converges exactly under at-least-once redelivery). */
  def startIndexStream(df: org.apache.spark.sql.DataFrame,
      indexTable: String, pairsTable: String, checkpointDir: String,
      k: Int = 8, rowsPerBand: Int = 2, nBuckets: Int = 8,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pairs = indexBatch(batch.sparkSession, indexTable, batch,
          k, rowsPerBand, nBuckets)
        graft.operators.SchemaDrift.writeBatchIdempotent(
          pairs, pairsTable, batchId)
        // the pair log is written; free the batch checkpoint's blocks
        // now instead of leaking one per batch until a driver GC
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .freeLocalCheckpoint(pairs)
        ()
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** Collisions of `probe` band rows against `lookup` band rows on the
    * band key, as distinct unordered pairs. */
  private def normalizedCollisions(probe: DataFrame,
      lookup: DataFrame): DataFrame = {
    val a = probe.select(col("bkey"), col("doc_id").as("da"))
    val b = lookup.select(col("bkey"), col("doc_id").as("db"))
    a.join(b, Seq("bkey"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
      .distinct()
  }
}
