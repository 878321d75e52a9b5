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
  * WITHIN one batch collapse to the per-id max metric struct —
  * deterministic under any partitioning, unlike a dropDuplicates
  * pick.
  */
object IncrementalSkyline {

  /** Fold one metrics batch (idCol ++ maxCols ++ minCols) into the
    * frontier table. */
  def applyBatch(spark: SparkSession, frontierTable: String,
      batch: DataFrame, idCol: String, maxCols: Seq[String],
      minCols: Seq[String], g: Int = 8): Unit = {
    TableSwap.recover(spark, frontierTable, s"${frontierTable}_stage")
    val dims = maxCols ++ minCols
    val cols = (idCol +: dims).map(col)
    // within-batch dedup by max metric struct (deterministic under
    // any partitioning); cross-batch dedup prefers the STATE row via
    // an anti-join on frontier ids — a redelivered id, even with
    // changed metrics, can never displace what was already folded
    val batchDedup = batch.select(cols: _*)
      .groupBy(col(idCol))
      .agg(max(struct(dims.map(col): _*)).as("_m"))
      .select(col(idCol) +: dims.map(d => col(s"_m.$d").as(d)): _*)
    val pool =
      if (spark.catalog.tableExists(frontierTable)) {
        val frontier = spark.table(frontierTable).select(cols: _*)
        frontier.unionByName(
          batchDedup.join(frontier.select(col(idCol)), Seq(idCol),
            "left_anti"))
      } else batchDedup
    val updated = SkylineOps.skyline(pool, idCol, maxCols, minCols, g)
    // bound: the frontier itself — the operator's OUTPUT, held
    // because it IS the sufficient state; a strongly anti-correlated
    // corpus grows it (the documented skyline cost honesty), at
    // which point the maintained form inherits skyline's partitioned
    // exact stage but the whole-frontier rewrite stops being cheap
    TableSwap.writeStaged(spark, updated, frontierTable)
    // the fold's action is done — drain the shell cache skyline()
    // registered (it recomputes transparently if ever re-read)
    SkylineOps.unpersistShellCaches()
    ()
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
