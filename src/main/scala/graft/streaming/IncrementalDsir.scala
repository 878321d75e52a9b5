package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Incrementally-maintained DSIR bucket statistics — the streaming
  * sibling of [[graft.operators.CurationOps.dsirWeights]] (doc30), and
  * the data-selection member of the derived-view family
  * ([[IncrementalAgg]] aggregates, [[IncrementalStats]] moments,
  * [[IncrementalJoin]]/[[IncrementalNearestJoin]] joins).
  *
  * DSIR's whole state is the per-bucket (corpus_cnt, target_cnt)
  * table — `buckets` rows, metadata-scale — and both counts are pure
  * SUMS over distinct (doc, shingle) rows. For an append-only corpus
  * arriving in document-disjoint batches (the training-data ingest
  * shape), the global distinct explosion is exactly the union of the
  * per-batch explosions, so per-bucket counts are ADDITIVE across
  * batches: each ingest batch contributes one batch-sized shingle
  * scan, never a corpus re-scan. At 100 TB that is the difference
  * between "selection weights are always current" and "re-profile the
  * corpus nightly".
  *
  * Idempotence: the bucket table carries the last-applied `_batch`
  * watermark; a replayed batchId is skipped wholesale. Writes go
  * through the [[TableSwap]] rename chain (a whole-table overwrite
  * would destroy the watermark with the table on a mid-write crash).
  *
  * Equivalence contract (doc32 pins it against doc30's own oracle):
  * after any sequence of document-disjoint batches plus redeliveries,
  * [[weightsFor]] over the full corpus equals the one-shot
  * `dsirWeights` — bit-identical, because the affinity formula and
  * the weight aggregation are the SAME shared code
  * ([[CurationOps.dsirRatios]] / [[CurationOps.dsirWeightsFromRatios]])
  * over identical counts.
  */
object IncrementalDsir {

  /** Fold one document batch into the bucket-count table. Batches
    * must be document-disjoint (append-only ingest); a redelivered
    * `batchId` is a watermark no-op. */
  def applyBatch(spark: SparkSession, bucketTable: String,
      batchDocs: DataFrame, targetSource: String, batchId: Long,
      buckets: Int = 64): Unit = FoldTimer.timed {
    TableSwap.recover(spark, bucketTable, s"${bucketTable}_stage")
    val exists = spark.catalog.tableExists(bucketTable)
    if (exists) {
      val last = spark.table(bucketTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = CurationOps.dsirShingles(batchDocs, buckets)
      .join(batchDocs.select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("dc"),
        sum((col("source") === targetSource).cast("long")).as("dt"))
    val updated = (if (exists)
        TableSwap.readVersioned(spark, bucketTable).drop("_batch")
          .join(deltas, Seq("bucket"), "full_outer")
          .select(col("bucket"),
            (coalesce(col("corpus_cnt"), lit(0L)) +
              coalesce(col("dc"), lit(0L))).as("corpus_cnt"),
            (coalesce(col("target_cnt"), lit(0L)) +
              coalesce(col("dt"), lit(0L))).as("target_cnt"))
      else
        deltas.select(col("bucket"), col("dc").as("corpus_cnt"),
          col("dt").as("target_cnt")))
      .withColumn("_batch", lit(batchId))
    // bound: <= nBuckets hashed n-gram rows (fixed grid, never
    // vocab- or corpus-keyed) — DsirBoundsSpec pins it.
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, bucketTable)
  }

  /** Current per-bucket affinity ratios (the shared smoothed-integer
    * formula over the maintained counts). */
  def readRatios(spark: SparkSession, bucketTable: String,
      buckets: Int = 64): DataFrame =
    CurationOps.dsirRatios(
      TableSwap.readVersioned(spark, bucketTable)
        .select("bucket", "corpus_cnt", "target_cnt"), buckets)

  /** DSIR weights for any document set against the CURRENT maintained
    * ratios — the serving-side call: score a candidate batch without
    * touching the corpus. */
  def weightsFor(spark: SparkSession, bucketTable: String,
      docs: DataFrame, buckets: Int = 64): DataFrame =
    CurationOps.dsirWeightsFromRatios(
      CurationOps.dsirShingles(docs, buckets),
      readRatios(spark, bucketTable, buckets))

  /** Continuous maintenance: foreachBatch [[applyBatch]] over a
    * streaming document frame — foreachBatch's monotone batchId is
    * the watermark, so at-least-once redelivery is a no-op by the
    * same contract the batch path pins. */
  def startIngestStream(df: DataFrame, bucketTable: String,
      targetSource: String, checkpointDir: String, buckets: Int = 64,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, bucketTable, batch,
          targetSource, batchId, buckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
