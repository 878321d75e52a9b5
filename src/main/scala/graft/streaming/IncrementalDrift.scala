package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Incrementally-maintained embedding-drift monitor — emb28's
  * per-dimension histogram kept current under batched ingest, so the
  * "has the embedding space moved off the frozen artifacts?" question
  * ([[graft.operators.CurationOps.embeddingDrift]]) is answerable
  * continuously without re-scanning the corpus.
  *
  * The state is the (dim, bin) histogram — counts and offset
  * fixed-point sums, both pure SUMS over rows, so cells are ADDITIVE
  * across vector-disjoint batches (the [[IncrementalDsir]] argument):
  * each ingest batch costs one batch-sized posexplode + a
  * 64·16-row merge, never a corpus re-scan. Drift against any frozen
  * reference histogram is then [[CurationOps.driftFromHists]] over
  * two metadata-scale tables — maintained == one-shot by shared code
  * over identical cell values, which cdc31 pins against emb28's own
  * oracle.
  *
  * Idempotence: `_batch` watermark, [[TableSwap]] staged writes —
  * the standing contract of the maintained-table family. */
object IncrementalDrift {

  /** Materialize a REFERENCE histogram (the frozen side a drift
    * monitor compares against — typically the corpus slice the
    * centroids/codebooks/bounds were trained on). */
  def freezeReference(spark: SparkSession, refTable: String,
      embs: DataFrame): Unit = {
    TableSwap.recover(spark, refTable, s"${refTable}_stage")
    // bound: dim x 16 fixed histogram bins
    TableSwap.writeStaged(spark,
      CurationOps.embeddingHistogram(embs), refTable)
  }

  /** Fold one vector batch into the current-side histogram. Batches
    * must be vector-disjoint; a redelivered batchId is a watermark
    * no-op. */
  def applyBatch(spark: SparkSession, histTable: String,
      batchEmbs: DataFrame, batchId: Long): Unit = FoldTimer.timed {
    TableSwap.recover(spark, histTable, s"${histTable}_stage")
    val exists = spark.catalog.tableExists(histTable)
    if (exists) {
      val last = spark.table(histTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = CurationOps.embeddingHistogram(batchEmbs)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, histTable).drop("_batch")
          .join(deltas.select(col("dim"), col("bin"),
            col("cnt").as("dc"), col("vsum").as("dv")),
            Seq("dim", "bin"), "full_outer")
          .select(col("dim"), col("bin"),
            (coalesce(col("cnt"), lit(0L)) +
              coalesce(col("dc"), lit(0L))).as("cnt"),
            (coalesce(col("vsum"), lit(0L)) +
              coalesce(col("dv"), lit(0L))).as("vsum"))
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: dim x 16 fixed histogram bins.
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, histTable)
  }

  /** Current drift report against the frozen reference — two
    * metadata-scale tables through the SAME formula as one-shot
    * emb28. */
  def driftReport(spark: SparkSession, refTable: String,
      histTable: String): DataFrame =
    CurationOps.driftFromHists(
      spark.table(refTable).select("dim", "bin", "cnt", "vsum"),
      TableSwap.readVersioned(spark, histTable)
        .select("dim", "bin", "cnt", "vsum"))

  /** Continuous maintenance: foreachBatch [[applyBatch]] over a
    * streaming embedding frame. */
  def startIngestStream(df: DataFrame, histTable: String,
      checkpointDir: String, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, histTable, batch, batchId)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
