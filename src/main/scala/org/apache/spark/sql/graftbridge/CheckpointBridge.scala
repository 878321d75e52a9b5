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
}
