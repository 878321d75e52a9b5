package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental SCD2 (type-2 slowly-changing-dimension) maintenance:
  * materialize a change-envelope stream into a continuously-maintained
  * VALIDITY-INTERVAL table — the history-keeping counterpart of
  * [[CdcMerge]]'s latest-state table, and the other table every CDC
  * consumer eventually builds (cdc12 computes this view as a batch
  * query over the full history; this maintains it per batch so readers
  * never rescan the history).
  *
  * Design (shares [[CdcMerge]]'s scale machinery):
  *
  *  - The table stores every change row (the per-key history), hash-
  *    partitioned on `_kb = pmod(xxhash64(key), nBuckets)` — a batch
  *    touches only the partitions its keys hash into (partition-pruned
  *    read, dynamic-partition-overwrite write).
  *  - Interval columns (`_valid_to`, `_is_current`) are REBUILT for the
  *    touched keys on every merge: union(current touched rows, batch
  *    events) → dedup on the event identity (key, version) → one lead()
  *    window per key. Rebuilding the whole per-key chain makes the
  *    merge idempotent under replays (duplicate events collapse in the
  *    dedup) AND correct under LATE events — an event older than
  *    already-applied ones simply splits the interval it lands in,
  *    something an append-only close-the-last-interval scheme cannot
  *    do. Cost: a key's full history is rewritten when touched; per-key
  *    history is dimension-row-sized, so the window never concentrates
  *    more than one key's chain in a task.
  *  - Deletes are retained as interval rows (op = Delete): the delete
  *    closes its predecessor and its own interval stays open-ended
  *    until a re-insert — identical to the cdc12 batch view, and the
  *    reason [[readCurrent]] filters them.
  *  - Same staged-write barrier as CdcMerge: the merged chain is staged
  *    to `table_stage`, then dynamic-partition-overwritten in; a crash
  *    mid-merge leaves the table untouched and the replayed batch
  *    redoes an idempotent merge.
  *
  * Event identity contract: (`keyCol`, `tsCol`, `tieCol`) uniquely
  * identifies an event, and redelivered events are byte-identical —
  * the reference's at-least-once redelivery model
  * (`stream_cdc/processing/coordinator.py:291-298`).
  */
object Scd2Merge {

  /** Merge one batch of change envelopes into the SCD2 table,
    * rebuilding the validity chain of every touched key. */
  def applyBatch(spark: SparkSession, table: String, batch: DataFrame,
      keyCol: String, tsCol: String, tieCol: String,
      nBuckets: Int): Unit = FoldTimer.timed {
    val events = batch.dropDuplicates(Seq(keyCol, tsCol, tieCol))
      .withColumn("_kb", pmod(xxhash64(col(keyCol)), lit(nBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = events.select("_kb").distinct()
        .collect().map(_.getLong(0))
      if (touched.isEmpty) return
      val chainW = Window.partitionBy(col(keyCol))
        .orderBy(col(tsCol), col(tieCol))
      def withIntervals(rows: DataFrame): DataFrame =
        rows.withColumn("_valid_to", lead(col(tsCol), 1).over(chainW))
          .withColumn("_is_current", col("_valid_to").isNull)
      if (!spark.catalog.tableExists(table)) {
        // clear a stale location from a crashed create (the CdcMerge
        // create-path hygiene: LOCATION_ALREADY_EXISTS otherwise)
        CdcMerge.dropStateTable(spark, table)
        withIntervals(events).repartition(col("_kb"))
          .write.mode("overwrite").format("parquet")
          .partitionBy("_kb").saveAsTable(table)
        return
      }
      val evCols = events.columns.toSeq
      val current = spark.table(table)
        .filter(col("_kb").isin(touched.toSeq: _*))
        .select(evCols.map(col): _*)
      val merged = withIntervals(
        current.unionByName(events)
          .dropDuplicates(Seq(keyCol, tsCol, tieCol)))
      // legacy-stage hygiene: this path used to stage through
      // `${table}_stage`; a crashed PRE-UPGRADE merge may have left
      // one behind. It is inert now (never read), but clear it so it
      // cannot shadow a future operator's stage name (spec-pinned).
      // One catalog lookup + fs stat — control-plane cost.
      CdcMerge.dropStateTable(spark, s"${table}_stage")
      // materialize the rebuilt chains ONCE (localCheckpoint), then
      // dynamic-overwrite the touched partitions in place — the
      // CdcMerge.applyBatchKeyed commit shape: the checkpoint cuts
      // the self-read lineage and retires the staged-table round-trip
      // this path carried (a full extra table write + create +
      // re-read + DROP per merge, measured across the cdc25 harness
      // in the r16 optimization round). Crash contract unchanged: the
      // insert replaces touched partitions at job commit; a crash
      // before that leaves the table untouched and the replayed batch
      // redoes an idempotent merge. Every touched partition is
      // non-empty (it holds at least the batch's own events), so no
      // drained-partition handling is needed.
      val cols = spark.table(table).columns
      val merged2 =
        CdcMerge.commitCheckpoint(merged.repartition(col("_kb")))
      try {
        val bridge = s"${table}_scd2_src"
        merged2.createOrReplaceGlobalTempView(bridge)
        try CdcMerge.withDynamicOverwrite(spark) { w =>
          w.table(s"global_temp.$bridge").select(cols.toSeq.map(col): _*)
            .write.mode("overwrite").insertInto(table)
        } finally spark.catalog.dropGlobalTempView(bridge)
      } finally {
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .freeLocalCheckpoint(merged2)
        ()
      }
      // same-session readers may hold a cached file listing of the
      // overwritten partitions (stale FILE_NOT_EXIST reads otherwise —
      // observed through a read-merge-read sequence); refresh is
      // metadata-only
      spark.catalog.refreshTable(table)
    } finally events.unpersist()
  }

  /** The full interval history (every version of every key). Reads
    * refresh the table first: the maintaining stream runs on a CLONED
    * session (foreachBatch), whose writes cannot invalidate THIS
    * session's cached file listing — without the refresh, a
    * read-merge-read sequence throws stale FILE_NOT_EXIST. */
  def readHistory(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table).drop("_kb")
  }

  /** Only the open intervals of live keys — the latest-state view,
    * equal to [[CdcMerge.readState]] over the same stream. */
  def readCurrent(spark: SparkSession, table: String,
      opCol: String = "event_type",
      deleteOp: String = "Delete"): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
      .filter(col("_is_current") && col(opCol) =!= deleteOp)
      .drop("_kb", "_valid_to", "_is_current")
  }

  /** Point-in-time state at `ts`: the interval containing `ts` per
    * key, deletes erased — time travel as ONE partition-pruned filter
    * over the maintained intervals (`valid_from <= ts < valid_to`),
    * no change-log replay and no window: the payoff of keeping the
    * SCD2 table materialized. Rows whose interval opened after `ts`
    * simply don't match; keys deleted at `ts` are filtered by op. */
  def stateAt(spark: SparkSession, table: String,
      ts: java.sql.Timestamp, tsCol: String = "ts",
      opCol: String = "event_type",
      deleteOp: String = "Delete"): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
      .filter(col(tsCol) <= lit(ts) &&
        (col("_valid_to").isNull || col("_valid_to") > lit(ts)))
      .filter(col(opCol) =!= deleteOp)
      .drop("_kb", "_valid_to", "_is_current")
  }

  /** Retention vacuum for the history table: remove CLOSED intervals
    * whose `_valid_to` is older than `cutoff` — the compliance/TTL
    * service every history-keeping table eventually needs (regulatory
    * retention, GDPR erasure horizons, or simply bounding history
    * growth). Open intervals (`_is_current`) are NEVER removed, so the
    * latest-state view is unaffected; returns the number of rows
    * removed.
    *
    * SAFETY CONTRACT (the [[CdcMerge.vacuumTombstones]] horizon rule,
    * applied to intervals): only vacuum beyond the upstream replay
    * horizon. A redelivered event older than the oldest RETAINED row
    * of its key would rebuild that key's chain from a truncated
    * history, re-opening an interval the vacuum closed — express the
    * cutoff so no replayable batch reaches behind it.
    *
    * Shape: only partitions holding prunable rows are rewritten
    * (partition-pruned read, dynamic partition overwrite); a
    * fully-drained partition is dropped outright (dynamic overwrite
    * cannot write an empty partition). Interval columns need no
    * rebuild: removing a PREFIX of a key's closed chain never changes
    * the `_valid_to` of retained rows (each row's close ts comes from
    * its SUCCESSOR, which is never older than the removed
    * predecessor). */
  def vacuumClosed(spark: SparkSession, table: String,
      cutoff: java.sql.Timestamp): Long = {
    // same cross-session staleness guard as every other consumer read
    // surface: a vacuum from a long-lived session after cloned-session
    // (foreachBatch) merges would otherwise hit a stale cached file
    // listing (the FILE_NOT_EXIST class fixed in readHistory et al.)
    spark.catalog.refreshTable(table)
    val dead = spark.table(table)
      .filter(!col("_is_current") && col("_valid_to") < lit(cutoff))
    val kbs = dead.select("_kb").distinct().collect().map(_.getLong(0))
    if (kbs.isEmpty) return 0L
    val removed = dead.count()
    val cols = spark.table(table).columns
    val kept = spark.table(table)
      .filter(col("_kb").isin(kbs.toSeq: _*))
      .filter(col("_is_current") || col("_valid_to") >= lit(cutoff))
    val stage = s"${table}_stage"
    if (!spark.catalog.tableExists(stage))
      CdcMerge.dropStateTable(spark, stage)
    kept.repartition(col("_kb"))
      .write.mode("overwrite").format("parquet").saveAsTable(stage)
    CdcMerge.withDynamicOverwrite(spark, stage, table) { w =>
      w.table(stage).select(cols.toSeq.map(col): _*)
        .write.mode("overwrite").insertInto(table)
    }
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    // no drained-partition handling, deliberately unlike
    // CdcMerge.vacuumTombstones: every key always retains its OPEN
    // interval (the newest row has _valid_to NULL and open rows are
    // never prunable), so every touched partition keeps >= 1 row and
    // the dynamic overwrite always rewrites it
    spark.catalog.refreshTable(table) // stale-listing guard (applyBatch)
    removed
  }

  /** Continuous apply: foreachBatch SCD2 merge of a streaming envelope
    * DataFrame — at-least-once upstream + idempotent chain rebuild =
    * effectively exactly-once interval history. */
  def startScd2Stream(df: DataFrame, table: String, keyCol: String,
      tsCol: String, tieCol: String, nBuckets: Int,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, table, batch, keyCol, tsCol,
          tieCol, nBuckets)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
