package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalOps

/** Incrementally-maintained retention cohorts — q63's matrix under
  * event ingest, through the COMPACTED-STATE pattern: the state is
  * the distinct (user, epoch-week) ACTIVITY GRID (≤ users ×
  * active-weeks rows — far below the event log it summarizes, and
  * the minimal sufficient statistic: cohort = per-user min week,
  * retention = grid membership), folded per batch by set union. The
  * matrix itself is recomputed from the grid on read — grid-sized
  * work, never an event-log re-scan — through the byte-shared
  * [[TemporalOps.retentionFromGrid]], so maintained == one-shot is
  * structural (cdc38 pins it against q63's oracle).
  *
  * Storage — the grid is CORPUS-KEYED state (users × active-weeks:
  * at the 100 TB north star, 10¹⁰⁺ rows), so it lives in a
  * [[CdcMerge]] hash-bucketed table keyed on the (user_id, wk) cell
  * and PARTITIONED on hash(user_id), NOT in a [[TableSwap]]
  * whole-rewrite table: a batch upserts only the directory buckets
  * its users hash into (scan and write ∝ touched buckets, never ∝
  * grid), through CdcMerge's staged dynamic-partition-overwrite —
  * crash-safe, no single-task write anywhere. A cell row is
  * immutable once present (version is a constant), so the merge's
  * max-version survivor rule degenerates to exactly the set union
  * the fold needs. Size `nBuckets` to the user population (the
  * CdcMerge rebucket discipline: one bucket ≈ a few GB).
  *
  * Replay safety: IDEMPOTENT BY CONSTRUCTION (the HLL/KMV/Bloom/
  * skyline camp) — the grid is a distinct set, so re-folding any
  * slice of the log is a no-op (the redelivered cell upserts over
  * itself); no watermark needed. Late events are handled exactly: an
  * out-of-order batch can only ADD grid cells, and a late-arriving
  * earlier week correctly re-ages its user's cohort on the next
  * read (min week is order-free). */
object IncrementalRetention {

  /** Fold one event batch (user_id, ts) into the bucketed grid
    * table. `nBuckets` must be stable for the table's lifetime
    * (CdcMerge contract; [[CdcMerge.rebucket]] is the resize
    * service). */
  def applyBatch(spark: SparkSession, gridTable: String,
      batch: DataFrame, nBuckets: Int = 32): Unit = FoldTimer.timed {
    val deltas = TemporalOps.activityGrid(batch)
      .withColumn("event_type", lit("Insert"))
      .withColumn("v", lit(1L))
    CdcMerge.applyBatchKeyed(spark, gridTable, deltas,
      keyCols = Seq("user_id", "wk"), versionCols = Seq("v"),
      nBuckets = nBuckets, partitionCols = Seq("user_id"))
  }

  /** The maintained (user_id, wk) grid — tombstone-filtered state
    * (the fold never writes tombstones; the filter is the CdcMerge
    * read contract). */
  def readGrid(spark: SparkSession, gridTable: String): DataFrame =
    CdcMerge.readState(spark, gridTable).select("user_id", "wk")

  /** The cohort × offset matrix served from the maintained grid. */
  def retentionReport(spark: SparkSession, gridTable: String,
      maxOffset: Int = 3): DataFrame =
    TemporalOps.retentionFromGrid(readGrid(spark, gridTable),
      maxOffset)

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, gridTable: String,
      checkpointDir: String, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, gridTable, batch, nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
