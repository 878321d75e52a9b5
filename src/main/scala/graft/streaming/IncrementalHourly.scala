package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalOps

/** Incrementally-maintained hourly event counts — q64's anomaly
  * audit under ingest, through the compacted-state pattern
  * ([[IncrementalRetention]]'s sibling): the state is the
  * (event_type, epoch-hour) count table — time-bounded rows, far
  * below the event log — folded per batch by ADDITION (counts are
  * pure sums, so batched == one-shot exactly); the anomaly report
  * recomputes state-sized on read through the byte-shared
  * [[TemporalOps.anomalyFromHourly]], which cdc39 pins against q64's
  * oracle. Late events land in their own hour cell exactly — the
  * report is recomputed from state, so a backfilled hour re-judges
  * its successors correctly on the next read.
  *
  * Replay safety: `_batch` watermark only — additive counts are NOT
  * idempotent (the [[IncrementalCms]]/[[IncrementalHist]] camp);
  * IncrementalHourlySpec pins that a bypassed replay drifts. */
object IncrementalHourly {

  /** Fold one (event_type, ts) batch into the hourly table. */
  def applyBatch(spark: SparkSession, hourlyTable: String,
      batch: DataFrame, batchId: Long): Unit = FoldTimer.timed {
    TableSwap.recover(spark, hourlyTable, s"${hourlyTable}_stage")
    val exists = spark.catalog.tableExists(hourlyTable)
    if (exists) {
      val last = spark.table(hourlyTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = TemporalOps.hourlyCounts(batch)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, hourlyTable)
          .select(col("event_type"), col("hr"), col("cnt"))
          .unionByName(deltas)
          .groupBy("event_type", "hr")
          .agg(sum("cnt").as("cnt"))
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: (event_type, hour) rows — enum types x time-bounded
    // hours, never corpus-keyed (TableSwap size contract). Full next
    // version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape)
    TableSwap.appendVersioned(spark, updated, hourlyTable)
  }

  /** The anomaly report served from the maintained hourly table. */
  def anomalyReport(spark: SparkSession, hourlyTable: String,
      trail: Int = 24, minTrail: Int = 12): DataFrame =
    TemporalOps.anomalyFromHourly(
      TableSwap.readVersioned(spark, hourlyTable)
        .select("event_type", "hr", "cnt"),
      trail, minTrail)

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, hourlyTable: String,
      checkpointDir: String, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, hourlyTable, batch, batchId)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
