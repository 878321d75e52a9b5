package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Incrementally-maintained KMV/theta sketches — q58's set-algebra
  * sketches kept current under batched ingest, completing the
  * maintained-sketch pair ([[IncrementalHll]] = cardinality-only
  * rollups, this = sketches that support INTERSECTION/difference).
  *
  * State is the per-segment k-smallest-hash table (≤ k·segments
  * rows). The fold step works because "k smallest distinct hashes"
  * is a MONOTONE pure set function:
  * kmin_k(A ∪ B) = kmin_k(kmin_k(A) ∪ hashes(B)) — so folding each
  * batch's distinct hashes into the standing sketch and re-taking
  * the k smallest is EXACTLY the one-shot sketch of everything seen,
  * not an approximation of it (cdc32 serves q58's report from the
  * maintained table against q58's own oracle — identical rows).
  *
  * Replay safety is again two-layer: the `_batch` watermark skips a
  * redelivered id, and set semantics make a bypassed replay a no-op
  * anyway (distinct hashes ∪ themselves). Per-batch cost: one
  * batch-sized distinct + a (state + batch-sketch)-sized per-segment
  * top-k window — the window frame is sketch-bounded, never raw
  * history. */
object IncrementalKmv {

  /** Fold one batch into the sketch table. `batch` must carry
    * (`segCol`, `valueCol`); k is fixed per table. */
  def applyBatch(spark: SparkSession, sketchTable: String,
      batch: DataFrame, segCol: String, valueCol: String,
      batchId: Long, k: Int = 64): Unit = FoldTimer.timed {
    TableSwap.recover(spark, sketchTable, s"${sketchTable}_stage")
    val exists = spark.catalog.tableExists(sketchTable)
    if (exists) {
      val last = spark.table(sketchTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = batch
      .select(col(segCol).as("seg"),
        SketchOps.u40(col(valueCol)).as("h"))
      .distinct()
    val unioned = (if (exists)
        TableSwap.readVersioned(spark, sketchTable)
          .select(col("seg"), col("h"))
          .unionByName(deltas).distinct()
      else deltas)
    val w = Window.partitionBy(col("seg")).orderBy(col("h"))
    val updated = unioned
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k).drop("_r")
      .withColumn("_batch", lit(batchId))
    // bound: <= k rows per segment (KMV sketch size, fixed k).
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, sketchTable)
  }

  /** The maintained sketches as a (seg, h) frame — feed to
    * [[SketchOps.overlapReport]] / [[SketchOps.kmvStats]]. */
  def readSketches(spark: SparkSession, sketchTable: String): DataFrame =
    TableSwap.readVersioned(spark, sketchTable).select("seg", "h")

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, sketchTable: String,
      segCol: String, valueCol: String, checkpointDir: String,
      k: Int = 64, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, sketchTable, batch, segCol,
          valueCol, batchId, k)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
