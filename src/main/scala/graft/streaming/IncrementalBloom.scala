package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Incrementally-maintained Bloom filter — the MEMBERSHIP member of
  * the maintained-sketch family ([[IncrementalHll]] distinct,
  * [[IncrementalKmv]] set algebra, [[IncrementalCms]] frequencies):
  * the continuously-updated "have we already ingested this?" gate a
  * streaming dedup / decontamination front end asks before paying
  * for an exact lookup. Folding a batch is a set UNION of the
  * batch's own bits — maintained == one-shot EXACTLY, and the state
  * is ≤ m rows forever whatever the stream.
  *
  * Replay safety TWICE over, like HLL and unlike CMS: the `_batch`
  * watermark skips a redelivered batch, and even bypassed, set union
  * is idempotent (x ∪ x = x) — bits cannot drift under re-addition.
  * IncrementalBloomSpec pins both layers; cdc35 pins
  * maintained == one-shot through the driver gate. */
object IncrementalBloom {

  /** Fold one member batch into the bit table. */
  def applyBatch(spark: SparkSession, bitsTable: String,
      batch: DataFrame, itemCol: String, batchId: Long,
      d: Int = 3, m: Int = 1024): Unit = FoldTimer.timed {
    TableSwap.recover(spark, bitsTable, s"${bitsTable}_stage")
    val exists = spark.catalog.tableExists(bitsTable)
    if (exists) {
      val last = spark.table(bitsTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = SketchOps.bloomBits(batch, itemCol, d, m)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, bitsTable).select(col("bit"))
          .unionByName(deltas)
          .distinct()
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: <= m set-bit rows (fixed Bloom array, KBs).
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, bitsTable)
  }

  /** The maintained bit set as a (bit) frame — feed to
    * [[SketchOps.bloomMightContain]]. */
  def readBits(spark: SparkSession, bitsTable: String): DataFrame =
    TableSwap.readVersioned(spark, bitsTable).select("bit")

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, bitsTable: String,
      itemCol: String, checkpointDir: String, d: Int = 3,
      m: Int = 1024, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, bitsTable, batch, itemCol,
          batchId, d, m)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
