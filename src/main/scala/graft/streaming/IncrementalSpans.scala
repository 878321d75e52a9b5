package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incrementally-maintained REPEATED-SPAN statistics — doc46's
  * exact-substring report (Lee et al. arXiv:2107.06499) kept current
  * under document ingest, through the compacted-state pattern: the
  * state is the (span_key, doc_id) → n_occ GRID — the minimal
  * sufficient statistic for the span-level report (n_docs = grid
  * rows per key, n_occ = their sum), far below the position-level
  * occurrence stream it summarizes. The span-level report (which
  * spans repeat across documents, how often) is recomputed
  * grid-sized on read; the position-level deletion list stays the
  * one-shot [[DedupOps.repeatedSpans]]'s job, since positions are
  * corpus-sized by nature.
  *
  * Storage — the grid is CORPUS-KEYED (∝ corpus token windows), so
  * it lives in a [[CdcMerge]] hash-bucketed table keyed on
  * (span_key, doc_id) and PARTITIONED on hash(span_key): a batch
  * upserts only the buckets its spans hash into (∝ batch tokens,
  * never ∝ corpus), through the staged dynamic-partition-overwrite —
  * the cdc38/cdc34 doctrine applied to the span grid. Size
  * `nBuckets` to the corpus (the rebucket discipline).
  *
  * Contract: DOCUMENT-DISJOINT append-only batches (the training-data
  * ingest shape — each doc arrives once, whole). Under it a
  * (span_key, doc_id) row's n_occ is fixed by the doc's own text, so
  * the fold is a pure row upsert: redelivering any batch rewrites
  * identical rows — IDEMPOTENT with a constant version, no watermark
  * needed (the retention-grid camp). A doc re-arriving with CHANGED
  * text is out of contract (its old spans would persist); route
  * updates through a delete+reinsert envelope instead. */
object IncrementalSpans {

  /** Fold one document batch into the span grid. */
  def applyBatch(spark: SparkSession, gridTable: String,
      batchDocs: DataFrame, spanLen: Int = 8,
      nBuckets: Int = 32): Unit = {
    val deltas = DedupOps.spanOccurrences(batchDocs, spanLen)
      .groupBy("span_key", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("event_type", lit("Insert"))
      .withColumn("v", lit(1L))
    CdcMerge.applyBatchKeyed(spark, gridTable, deltas,
      keyCols = Seq("span_key", "doc_id"), versionCols = Seq("v"),
      nBuckets = nBuckets, partitionCols = Seq("span_key"))
  }

  /** The doc46-shaped span-level report served from the maintained
    * grid: spans occurring in ≥ 2 distinct documents, with doc and
    * occurrence counts — one map-side-combined aggregate over the
    * grid (n_docs = rows per key, since (span_key, doc_id) is the
    * grid's primary key). */
  def spanReport(spark: SparkSession, gridTable: String): DataFrame =
    CdcMerge.readState(spark, gridTable)
      .groupBy("span_key")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_occ")).as("n_occ"))
      .filter(col("n_docs") >= 2)

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, gridTable: String,
      checkpointDir: String, spanLen: Int = 8, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, gridTable, batch, spanLen,
          nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
