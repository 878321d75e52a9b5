package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Incrementally-maintained WEIGHTED PRIORITY SAMPLE — doc48's
  * deterministic bottom-k selector ([[CurationOps.prioritySample]],
  * Duffield–Lund–Thorup class) kept current under document ingest:
  * the continuously-refreshed "representative subset" a training
  * pipeline watches while the corpus grows (eval slices, spot-check
  * queues, curriculum seeds).
  *
  * Why this fold is EXACT and tiny: bottom-k under a total order is a
  * MERGEABLE summary — any document in the global bottom-k is in its
  * own batch's bottom-k, so
  * `bottomK(state ∪ bottomK(batch)) == bottomK(corpus so far)`,
  * bit-for-bit (the order (priority, doc_id) is total, and each doc's
  * row is a pure function of its id and text — no RNG, the doc08
  * doctrine). The fold is also IDEMPOTENT: re-merging rows already in
  * the state cannot change a bottom-k, so even a replay that BYPASSES
  * the batch watermark (the crash window between state write and
  * watermark write) re-converges to the identical sample — stronger
  * than the additive camp (CMS/hist/df counts), where the watermark
  * is load-bearing. The watermark here only short-circuits clean
  * replays before any job runs.
  *
  * State: exactly ≤ k rows (doc_id, w, priority, _k) — control-plane
  * bounded, the [[TableSwap]] size contract's easiest citizen. Each
  * fold reads ≤ k state rows, bottom-k's the batch (planned as
  * TakeOrderedAndProject: per-partition heaps, k-row driver merge),
  * and rewrites ≤ k rows. Per-fold cost ∝ batch scan; state I/O is
  * O(k) regardless of corpus size.
  *
  * Contract: append-only document batches with monotonically
  * increasing batch ids (the foreachBatch shape). Re-delivered
  * batches are welcome (idempotent, see above); a doc re-arriving
  * with CHANGED text is out of contract — its old row may already be
  * sampled and bottom-k cannot retract (deletion-capable sampling
  * needs the CdcMerge state family, not a mergeable summary). `k` is
  * FIXED for the table's lifetime — a larger k cannot be served from
  * a smaller-k state (discarded rows are gone) and the failure would
  * be silent, so k rides in the watermark row and folds fail fast on
  * drift (the funnel-nBuckets doctrine). */
object IncrementalSample {

  private def wmTable(table: String) = s"${table}_wm"

  /** All tables the sample maintains — for test/registration
    * cleanup. */
  def tables(table: String): Seq[String] =
    Seq(table, s"${table}_stage", s"${table}_old",
      wmTable(table), s"${wmTable(table)}_stage",
      s"${wmTable(table)}_old")

  /** Fold one document batch into the maintained sample. */
  def applyBatch(spark: SparkSession, table: String,
      batchDocs: DataFrame, batchId: Long, k: Int = 64): Unit =
    FoldTimer.timed {
      require(k >= 1)
      val wm = wmTable(table)
      TableSwap.recover(spark, wm, s"${wm}_stage")
      TableSwap.recover(spark, table, s"${table}_stage")
      val stateExists = spark.catalog.tableExists(table)
      // k is fixed for the table's lifetime: a LARGER k cannot be
      // served from a smaller-k state (rows outside the old bottom-k
      // were discarded and cannot be recovered), and the failure
      // would be silent — the funnel-nBuckets doctrine. k rides in
      // BOTH the watermark row and a constant state column, because
      // the first-fold crash window (state written, watermark not)
      // must not bypass the guard.
      def requireK(stored: Long): Unit =
        require(stored == k.toLong,
          s"$table was built with k=$stored but the caller passed " +
            s"k=$k; k is fixed for the table's lifetime (rebuild " +
            "the sample to change it)")
      if (spark.catalog.tableExists(wm)) {
        val row = spark.table(wm)
          .agg(coalesce(max("_batch"), lit(-1L)),
            coalesce(max("_k"), lit(k.toLong))).collect()(0)
        requireK(row.getLong(1))
        if (batchId <= row.getLong(0)) return
      } else if (stateExists) {
        requireK(spark.table(table)
          .agg(coalesce(max("_k"), lit(k.toLong))).collect()(0)
          .getLong(0))
      }
      val cand = CurationOps.prioritySample(batchDocs, k)
        .withColumn("_k", lit(k.toLong))
      val merged =
        if (stateExists) spark.table(table).unionByName(cand)
        else cand
      // ≤ 2k rows from here on. dropDuplicates is the crash-window
      // guard: a watermark-bypassing replay re-offers rows already in
      // the state; duplicate rows are IDENTICAL (priority is a pure
      // function of the doc), so the dedup is deterministic.
      val next = merged.dropDuplicates("doc_id")
        .orderBy(col("priority"), col("doc_id")).limit(k)
      // TableSwap bound: ≤ k rows by construction (the limit above)
      TableSwap.writeStaged(spark, next, table)
      import spark.implicits._
      // 1-row watermark carrying k: bounded state — the TableSwap
      // size contract; properties can't ride on the table itself
      // because the swap rewrites it each fold
      TableSwap.writeStaged(spark,
        Seq((batchId, k.toLong)).toDF("_batch", "_k"), wm)
    }

  /** The maintained sample — ≤ k rows (doc_id, w, priority), equal to
    * [[CurationOps.prioritySample]] over every document folded so
    * far. */
  def sample(spark: SparkSession, table: String): DataFrame = {
    TableSwap.recover(spark, table, s"${table}_stage")
    spark.catalog.refreshTable(table)
    // _k is the lifetime guard column, not part of the sample
    spark.table(table).select(col("doc_id"), col("w"), col("priority"))
  }

  /** Continuous maintenance: foreachBatch [[applyBatch]] under the
    * stream's own monotone batch ids. */
  def startIngestStream(df: DataFrame, table: String,
      checkpointDir: String, k: Int = 64, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId, k)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
