package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkylineOps

/** Incrementally-maintained Pareto frontier — the skyline (doc43)
  * under APPEND-ONLY ingest. The state is the frontier itself, never
  * the corpus: a point dominated once is dominated forever (adding
  * points only adds dominators), so
  * frontier(S ∪ B) = skyline(frontier(S) ∪ B) — each batch folds
  * against frontier-sized state, work ∝ |frontier| + |batch| through
  * the same lossless grid prune, while the corpus itself can be
  * 100 TB and is never revisited.
  *
  * Replay safety: IDEMPOTENT BY CONSTRUCTION (the HLL/KMV/Bloom camp
  * of the family, not the CMS/Hist camp) — the fold dedupes on the
  * id column and re-folding any already-seen point leaves the
  * frontier unchanged (ties never dominate each other), so
  * at-least-once delivery needs no watermark. The spec pins a
  * double-fold no-op. Contract: append-only ids — an UPDATE to a
  * previously-folded point's metrics is out of scope (the frontier
  * no longer holds the dominated history to re-judge against). The
  * fold enforces the contract DETERMINISTICALLY: an already-folded
  * id arriving again (even with changed metrics — the out-of-scope
  * update) is dropped by an anti-join against the frontier ids, so
  * the state row always survives; redelivery can never silently
  * replace state with an arbitrary pool survivor. Duplicate ids
  * WITHIN one batch collapse to the per-id best metric struct —
  * maximize-dims as-is, minimize-dims NEGATED inside the comparison
  * struct so the kept representative is the per-id non-dominated
  * pick on EVERY dim (a plain max(struct) would keep the LARGER,
  * i.e. dominated, variant on minimize-dims) — deterministic under
  * any partitioning, unlike a dropDuplicates pick.
  *
  * WRITE PATH scales with the frontier (the doc43 cost honesty,
  * inherited): a typical frontier is hundreds of rows and the state
  * write is a 1-file [[TableSwap]] rewrite; a strongly
  * ANTI-CORRELATED corpus grows the frontier with n, at which point
  * one `coalesce(1)` task would serialize the whole fold. The write
  * is therefore gated on the SAME 100k-class threshold the compute
  * stage gates its broadcast on: above it the staged rewrite is
  * hash-spread across ~32k-row files ([[TableSwap.writeStagedSpread]]
  * — same rename-chain crash safety, no single task). */
object IncrementalSkyline {

  /** Fold one metrics batch (idCol ++ maxCols ++ minCols) into the
    * frontier table. `bigFrontierLimit` gates the write shape: at or
    * below it the frontier stages as one file; above it the stage
    * write spreads across hash partitions (the anti-correlated-corpus
    * path — aligned with [[SkylineOps.skyline]]'s broadcast gate). */
  def applyBatch(spark: SparkSession, frontierTable: String,
      batch: DataFrame, idCol: String, maxCols: Seq[String],
      minCols: Seq[String], g: Int = 8,
      bigFrontierLimit: Long = 100000L): Unit = FoldTimer.timed {
    TableSwap.recover(spark, frontierTable, s"${frontierTable}_stage")
    val dims = maxCols ++ minCols
    val cols = (idCol +: dims).map(col)
    // within-batch dedup by best metric struct (deterministic under
    // any partitioning; minimize-dims negated so max() prefers the
    // SMALLER value there); cross-batch dedup prefers the STATE row
    // via an anti-join on frontier ids — a redelivered id, even with
    // changed metrics, can never displace what was already folded
    val cmpStruct = struct(
      maxCols.map(col) ++ minCols.map(d => (-col(d)).as(d)): _*)
    val batchDedup = batch.select(cols: _*)
      .groupBy(col(idCol))
      .agg(max(cmpStruct).as("_m"))
      .select(col(idCol) +:
        (maxCols.map(d => col(s"_m.$d").as(d)) ++
          minCols.map(d => (-col(s"_m.$d")).as(d))): _*)
    val pool =
      if (spark.catalog.tableExists(frontierTable)) {
        val frontier = spark.table(frontierTable).select(cols: _*)
        frontier.unionByName(
          batchDedup.join(frontier.select(col(idCol)), Seq(idCol),
            "left_anti"))
      } else batchDedup
    val updated = SkylineOps
      .skyline(pool, idCol, maxCols, minCols, g,
        broadcastShellLimit = bigFrontierLimit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the count both materializes the frontier once (so the staged
      // write below reuses it instead of recomputing the skyline) and
      // decides the write shape
      val nFrontier = updated.count()
      if (nFrontier <= bigFrontierLimit)
        // bound: the frontier itself — the operator's OUTPUT, held
        // because it IS the sufficient state; hundreds of rows on
        // typical corpora (measured)
        TableSwap.writeStaged(spark, updated, frontierTable)
      else
        // anti-correlated corpus: frontier ∝ n — spread the staged
        // rewrite, never one task (same crash-safe rename chain)
        TableSwap.writeStagedSpread(spark, updated, frontierTable,
          xxhash64(col(idCol)), nRows = nFrontier)
    } finally {
      updated.unpersist()
      // drain the shell cache skyline() registered (it recomputes
      // transparently if ever re-read) — the fold's action is done
      SkylineOps.unpersistShellCaches()
      ()
    }
  }

  /** The maintained frontier as a (idCol ++ dims) frame. */
  def readFrontier(spark: SparkSession, frontierTable: String,
      idCol: String, maxCols: Seq[String],
      minCols: Seq[String]): DataFrame =
    spark.table(frontierTable)
      .select((idCol +: (maxCols ++ minCols)).map(col): _*)

  /** Continuous maintenance: foreachBatch [[applyBatch]]. */
  def startIngestStream(df: DataFrame, frontierTable: String,
      idCol: String, maxCols: Seq[String], minCols: Seq[String],
      checkpointDir: String, g: Int = 8, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, frontierTable, batch, idCol,
          maxCols, minCols, g)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
