package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Incrementally-maintained histogram quantile sketch — the QUANTILE
  * member of the maintained-sketch family ([[IncrementalHll]]
  * distinct, [[IncrementalKmv]] set algebra, [[IncrementalCms]]
  * frequency, [[IncrementalBloom]] membership, this = order
  * statistics under ingest). Bins are plain BIGINT SUMS over the
  * REGISTERED domain (fixed at table creation — a bin's meaning can
  * never change once batches fold in), so folding a batch is
  * bin-wise addition of the batch's own sketch: maintained ==
  * one-shot EXACTLY, which cdc36 pins against q62's oracle. State is
  * ≤ groups·w rows forever.
  *
  * Replay safety: `_batch` watermark only — counts are NOT
  * idempotent under re-addition (the [[IncrementalCms]] contrast
  * with set-union sketches); IncrementalHistSpec pins that a
  * bypassed replay DOES drift. */
object IncrementalHist {

  /** Fold one (grpCol, valCol) batch into the sketch table. */
  def applyBatch(spark: SparkSession, histTable: String,
      batch: DataFrame, grpCol: String, valCol: String, batchId: Long,
      lo: Long, hi: Long, w: Int): Unit = FoldTimer.timed {
    TableSwap.recover(spark, histTable, s"${histTable}_stage")
    val exists = spark.catalog.tableExists(histTable)
    if (exists) {
      val last = spark.table(histTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = SketchOps.histSketch(batch, grpCol, valCol, lo, hi, w)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, histTable)
          .select(col(grpCol), col("bin"), col("cnt"))
          .unionByName(deltas)
          .groupBy(grpCol, "bin")
          .agg(sum("cnt").as("cnt"))
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: groups x w fixed bins (enum group key contract).
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, histTable)
  }

  /** The maintained sketch as a (grpCol, bin, cnt) frame — feed to
    * [[SketchOps.histQuantiles]]. */
  def readHist(spark: SparkSession, histTable: String,
      grpCol: String): DataFrame =
    TableSwap.readVersioned(spark, histTable)
      .select(col(grpCol), col("bin"), col("cnt"))

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, histTable: String,
      grpCol: String, valCol: String, checkpointDir: String,
      lo: Long, hi: Long, w: Int, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, histTable, batch, grpCol,
          valCol, batchId, lo, hi, w)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
