package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Incrementally-maintained Count-Min sketch — the frequency member
  * of the maintained-sketch family ([[IncrementalHll]] distinct,
  * [[IncrementalKmv]] set algebra, this = per-item counts under
  * ingest). The grid cells are plain BIGINT SUMS, so folding a batch
  * is cell-wise addition of the batch's own grid — maintained ==
  * one-shot EXACTLY (integer sums associate), which cdc33 pins
  * against doc39's one-shot oracle. State is d·w rows forever, no
  * matter how much stream passes through — the strongest
  * state-bound in the family (HLL is register-fixed too, but CMS
  * additionally answers per-ITEM questions).
  *
  * Replay safety: `_batch` watermark only — counts are NOT
  * idempotent under re-addition (unlike HLL registers / KMV sets),
  * which is exactly why the watermark layer exists in this family.
  * IncrementalCmsSpec pins that a bypassed replay DOES drift, the
  * honest contrast with cdc30/cdc32. */
object IncrementalCms {

  /** Fold one item batch into the grid table. */
  def applyBatch(spark: SparkSession, gridTable: String,
      batch: DataFrame, itemCol: String, batchId: Long,
      d: Int = 4, w: Int = 256): Unit = FoldTimer.timed {
    TableSwap.recover(spark, gridTable, s"${gridTable}_stage")
    val exists = spark.catalog.tableExists(gridTable)
    if (exists) {
      val last = spark.table(gridTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = SketchOps.cmsGrid(batch, itemCol, d, w)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, gridTable)
          .select(col("row"), col("bucket"), col("cnt"))
          .unionByName(deltas)
          .groupBy("row", "bucket")
          .agg(sum("cnt").as("cnt"))
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: d x w fixed counter grid (CMS dimensions).
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, gridTable)
  }

  /** The maintained grid as a (row, bucket, cnt) frame — feed to
    * [[SketchOps.cmsEstimate]]. */
  def readGrid(spark: SparkSession, gridTable: String): DataFrame =
    TableSwap.readVersioned(spark, gridTable)
      .select("row", "bucket", "cnt")

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, gridTable: String,
      itemCol: String, checkpointDir: String, d: Int = 4,
      w: Int = 256, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, gridTable, batch, itemCol,
          batchId, d, w)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
