package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained NEAREST-event join view — the streaming
  * sibling of [[graft.operators.TemporalOps.nearestJoin]] (q56), and
  * the temporal member of the derived-view family ([[IncrementalAgg]]
  * aggregates, [[IncrementalStats]] moments, [[IncrementalJoin]]
  * equi-joins). The view a feature pipeline serves online: each left
  * event enriched with its key's closest right event in EITHER time
  * direction (ties backward), kept current as both event streams
  * trickle in.
  *
  * Why the equi-join formulation can't be reused directly: a single
  * new right event can FLIP the nearest match of left rows that were
  * not in any batch (it may now be closer than their previous match).
  * Nearest-ness is, however, decomposable per join key — a left row's
  * match depends only on right rows of the SAME key — so key-level
  * dirtiness is exactly the right invalidation unit:
  *
  * Per batch: merge each side's change batch into its event-log state
  * table (idempotent [[CdcMerge.applyBatch]], keyed by the EVENT
  * identity, so redeliveries and tombstones behave); dirty keys = the
  * distinct `joinKey` values present in either batch; recompute the
  * nearest join restricted to dirty keys (both states semi-joined to
  * the batch-sized dirty set — the union+window one-shuffle shape,
  * never a per-row probe) and rewrite only the view partitions those
  * keys hash into ([[IncrementalJoin.rewriteView]]). Cost ∝ the dirty
  * keys' group sizes + touched partitions — never either table's
  * size, which is what keeps a 100 TB enrichment view maintainable
  * from a trickle of changes.
  *
  * Correctness contracts (spec-pinned, cdc27 pins the first against
  * the DuckDB oracle):
  *  - **Equivalence**: after any batch sequence, the view equals the
  *    one-shot `nearestJoin(readState(left), rightPrep(readState(
  *    right)))`.
  *  - **Idempotent replay**: a redelivered batch merges to identical
  *    state and rewrites identical partitions.
  *  - **Match flip**: a right event closer than a left row's current
  *    match replaces it on the next batch touching that key, even
  *    when the left row itself was in no batch.
  *  - **Tombstones**: a deleted left event leaves the view; a deleted
  *    right event stops matching (its victims re-match to the next
  *    nearest or NULL — left-join semantics).
  *
  * `rightPrep` maps the dirty-restricted right state to the
  * unique-(key, time) side [[graft.operators.TemporalOps.nearestJoin]]
  * requires (e.g. a per-(key, day) aggregate, as cdc27 builds). It
  * must be a PER-KEY-GROUP function (its output rows for a key depend
  * only on that key's input rows) — anything keyed `groupBy(joinKey,
  * ...)` qualifies — and must keep `joinKey` and `rightTime` named as
  * given. Both batches must carry `joinKey` under that name
  * (pre-project — the cdc27 query renames `o_custkey`). */
object IncrementalNearestJoin {

  /** Merge the change batches (either may be absent) and maintain
    * `viewTable`. Each side's state table is keyed by its `idCol`
    * (event identity; `versionCols` order redeliveries), and its
    * `opCol` marks tombstones per [[CdcMerge.readState]]'s contract.
    * View columns: all left state columns, then `valueCols` from the
    * prepared right side, then `gap_us`. */
  def applyBatch(spark: SparkSession, leftTable: String,
      rightTable: String, viewTable: String,
      leftBatch: Option[DataFrame], rightBatch: Option[DataFrame],
      joinKey: String, leftIdCol: String, rightIdCol: String,
      leftVersionCols: Seq[String], rightVersionCols: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      rightPrep: DataFrame => DataFrame = identity, nBuckets: Int = 8,
      leftOpCol: String = "event_type", rightOpCol: String = "event_type",
      deleteOp: String = "Delete"): Unit = FoldTimer.timed {
    // states merge on row IDENTITY but bucket on the JOIN KEY (the
    // CdcMerge partitionCols lever): a dirty key's rows — on both
    // sides — then live in the buckets its hash names, so the
    // recompute below reads only those partitions. The partition-col
    // stability invariant holds by construction: an event's join key
    // is part of its content, not its version.
    // merges hand back their committed checkpointed frames — the view
    // recompute reads the post-merge touched buckets from them instead
    // of re-reading the tables (see IncrementalJoin.applyBatch)
    val lKeep = leftBatch.flatMap(b => CdcMerge.applyBatchKeyedRetained(
      spark, leftTable, b, Seq(leftIdCol), leftVersionCols, nBuckets,
      partitionCols = Seq(joinKey)))
    val rKeep = rightBatch.flatMap(b => CdcMerge.applyBatchKeyedRetained(
      spark, rightTable, b, Seq(rightIdCol), rightVersionCols, nBuckets,
      partitionCols = Seq(joinKey)))
    try {
      val dirty = (leftBatch.toSeq ++ rightBatch.toSeq)
        .map(_.select(col(joinKey)))
        .reduceOption(_ unionByName _)
        .map(_.distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .getOrElse(return)
      try {
        // touched view partitions: driver-side but bounded by nBuckets;
        // derived from the DIRTY KEYS, not from fresh rows, so a key
        // whose rows all vanished still gets its partition rewritten
        val touched = dirty
          .select(pmod(xxhash64(col(joinKey)), lit(nBuckets)).as("_kb"))
          .distinct().collect().map(_.getLong(0))
        if (touched.isEmpty) return

        val l = IncrementalJoin.stateSide(spark, leftTable, touched,
            lKeep, leftOpCol, deleteOp, nBuckets)
          .join(broadcast(dirty), Seq(joinKey), "left_semi")
        val r = rightPrep(
          IncrementalJoin.stateSide(spark, rightTable, touched,
              rKeep, rightOpCol, deleteOp, nBuckets)
            .join(broadcast(dirty), Seq(joinKey), "left_semi"))
        val fresh = graft.operators.TemporalOps.nearestJoin(
            l, r, joinKey, joinKey, leftTime, rightTime, valueCols)
          .withColumn("_kb", pmod(xxhash64(col(joinKey)), lit(nBuckets)))
        IncrementalJoin.rewriteView(spark, viewTable, joinKey, dirty,
          touched, fresh)
      } finally dirty.unpersist()
    } finally IncrementalJoin.freeKeeps(lKeep, rKeep)
  }

  /** The maintained view, without the bucketing column. */
  def readView(spark: SparkSession, viewTable: String): DataFrame =
    IncrementalJoin.readView(spark, viewTable)
}
