package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset

/** Bridge for freeing the cached blocks behind a `localCheckpoint()`.
  *
  * A localCheckpoint pins its blocks in the BlockManager until the
  * driver's GC makes the underlying RDD unreachable and the
  * ContextCleaner notices (`spark.cleaner.periodicGC.interval`
  * defaults to 30 MINUTES) — on a large driver heap that is
  * effectively "never" within a job. An iterative algorithm that
  * checkpoints per round (connected components, incremental index
  * ingest) therefore accumulates every superseded round's blocks,
  * squeezing executor storage/execution memory for the rest of the
  * application — measured as 2-4× inflation of UNRELATED downstream
  * queries in a 135-query sweep. Freeing the superseded checkpoint the
  * moment the next round materializes keeps resident state O(1) rounds.
  *
  * Lives in an `org.apache.spark.sql` subpackage to reach the classic
  * Dataset's `queryExecution` (same technique as [[ColumnBridge]]).
  */
object CheckpointBridge {

  /** Unpersists the RDD behind a checkpointed Dataset's `LogicalRDD`
    * plan. Call ONLY on a superseded checkpoint no downstream plan
    * will read again — the blocks are gone immediately (localCheckpoint
    * data is unrecoverable by design). Returns false (no-op) when the
    * plan is not a bare checkpoint result. */
  def freeLocalCheckpoint(df: Dataset[_]): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        true
      case _ => false
    }

  /** `localCheckpoint()` with the carried-over plan STATISTICS
    * dropped. Spark's localCheckpoint propagates the child plan's
    * computed `Statistics` onto the resulting `LogicalRDD`
    * (`originStats`) so estimates survive the lineage cut — but in a
    * CHECKPOINT-PER-ROUND loop whose round joins two checkpointed
    * frames, the carried `sizeInBytes` BigInts MULTIPLY every round:
    * the bit length doubles per iteration and by round ~25 the
    * optimizer burns minutes per round inside
    * `BigInteger.multiplyToomCook3` (measured: round wall 1 s → 2 s →
    * 7 s → 55 s → 433 s on a 200-row frame; a thread dump pinned the
    * driver in Toom-Cook multiplication). Rebuilding the
    * `LogicalRDD` without `originStats` resets the estimate to the
    * session default — exactly right for loop-state frames, whose
    * size the optimizer should treat as unknown-small anyway.
    * Partitioning/ordering metadata is preserved; the returned frame
    * reads the SAME checkpoint blocks, so [[freeLocalCheckpoint]] on
    * it frees them. */
  def localCheckpointFreshStats(
      df: Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val ck = df.localCheckpoint()
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]]
    ck.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(ck.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            ck.sparkSession, None, None))
      case _ => ck
    }
  }
}
