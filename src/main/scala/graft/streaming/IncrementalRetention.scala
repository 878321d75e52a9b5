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
  * Replay safety: IDEMPOTENT BY CONSTRUCTION (the HLL/KMV/Bloom/
  * skyline camp) — the grid is a distinct set, so re-folding any
  * slice of the log is a no-op; no watermark needed. Late events are
  * handled exactly: an out-of-order batch can only ADD grid cells,
  * and a late-arriving earlier week correctly re-ages its user's
  * cohort on the next read (min week is order-free). */
object IncrementalRetention {

  /** Fold one event batch (user_id, ts) into the grid table. */
  def applyBatch(spark: SparkSession, gridTable: String,
      batch: DataFrame): Unit = {
    TableSwap.recover(spark, gridTable, s"${gridTable}_stage")
    val deltas = TemporalOps.activityGrid(batch)
    val updated =
      (if (spark.catalog.tableExists(gridTable))
         spark.table(gridTable).select("user_id", "wk")
           .unionByName(deltas).distinct()
       else deltas)
    TableSwap.writeStaged(spark, updated, gridTable)
  }

  /** The cohort × offset matrix served from the maintained grid. */
  def retentionReport(spark: SparkSession, gridTable: String,
      maxOffset: Int = 3): DataFrame =
    TemporalOps.retentionFromGrid(
      spark.table(gridTable).select("user_id", "wk"), maxOffset)

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, gridTable: String,
      checkpointDir: String, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, gridTable, batch)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
