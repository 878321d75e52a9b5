package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained HLL distinct-count sketches — the
  * streaming sibling of q57's mergeable rollup, and the
  * distinct-count member of the derived-view family
  * ([[IncrementalAgg]] sums, [[IncrementalStats]] moments,
  * [[IncrementalDsir]] selection stats).
  *
  * State is the per-(event_type, day) SKETCH table — grain-bounded
  * metadata, never raw ids. Each ingest batch builds batch-grain
  * sketches in one pass and folds them in by HLL UNION (per-register
  * max — commutative, associative, and element-idempotent), so:
  *
  *  - per-batch cost is one batch scan + a grain-sized union, never a
  *    re-scan of raw history — at 100 TB the raw event log is cold
  *    storage while any distinct-count rollup stays answerable from
  *    kilobytes of state;
  *  - batched == one-shot by ALGEBRA: sketch(A ∪ B) has exactly the
  *    max-register state of union(sketch(A), sketch(B)) at the same
  *    lgK, which cdc30 pins against q57's one-shot estimates;
  *  - replay safety is two-layer: the `_batch` watermark skips a
  *    redelivered batch wholesale, and even WITHOUT the watermark a
  *    replayed batch is a register-level no-op (max(x, x) = x) — the
  *    only derived view in the family whose idempotence needs no
  *    bookkeeping at all (IncrementalHllSpec pins both layers).
  *
  * Writes go through the [[TableSwap]] rename chain, same crash
  * contract as every other maintained table.
  */
object IncrementalHll {

  /** Per-register-width log2(K); 12 is the q57 setting (~1.6% SE). */
  val DefaultLgK = 12

  private def batchSketches(events: DataFrame, lgK: Int): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))

  /** Fold one event batch into the sketch table. A redelivered
    * `batchId` is a watermark no-op (and would be a register no-op
    * anyway — see the class doc). */
  def applyBatch(spark: SparkSession, sketchTable: String,
      batchEvents: DataFrame, batchId: Long,
      lgK: Int = DefaultLgK): Unit = FoldTimer.timed {
    TableSwap.recover(spark, sketchTable, s"${sketchTable}_stage")
    val exists = spark.catalog.tableExists(sketchTable)
    if (exists) {
      val last = spark.table(sketchTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val deltas = batchSketches(batchEvents, lgK)
    val updated = (if (exists)
        TableSwap.readVersioned(spark, sketchTable)
          .select(col("event_type"), col("day"), col("sk"))
          .unionByName(deltas)
          .groupBy("event_type", "day")
          .agg(expr("hll_union_agg(sk)").as("sk"))
      else deltas)
      .withColumn("_batch", lit(batchId))
    // bound: one register blob per (type, day) — enum x time-bounded.
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, sketchTable)
  }

  /** Distinct-user estimate per event_type from the CURRENT state —
    * any rollup coarser than the stored grain answers by union,
    * without touching raw events. */
  def estimateByType(spark: SparkSession,
      sketchTable: String): DataFrame =
    TableSwap.readVersioned(spark, sketchTable)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))

  /** Continuous maintenance: foreachBatch [[applyBatch]] over a
    * streaming event frame; foreachBatch's monotone batchId is the
    * watermark. */
  def startIngestStream(df: DataFrame, sketchTable: String,
      checkpointDir: String, lgK: Int = DefaultLgK,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, sketchTable, batch, batchId, lgK)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
