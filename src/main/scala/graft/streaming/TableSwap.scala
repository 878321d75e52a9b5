package graft.streaming

import org.apache.spark.sql.SparkSession

/** Crash-recoverable whole-table swap for the small UNPARTITIONED
  * managed tables the consumer layer maintains (incremental
  * aggregates, streaming-k-means centroids — groups/k-sized).
  *
  * SIZE CONTRACT — bounded state only: [[writeStaged]] rewrites the
  * WHOLE table through a single-task `coalesce(1)` write (one file =
  * atomic swap unit), so per-batch cost ∝ state size and the write
  * never parallelizes. That is the right shape exactly when the
  * state is CONTROL-PLANE BOUNDED — sketch registers, fixed
  * histogram/CMS grids, k centroids, enum-keyed aggregates,
  * time-bounded (type, hour) counts, a 1-row watermark. It is the
  * WRONG shape for corpus-keyed state (per-user, per-doc, per-vector
  * rows): those grow with the data and belong in a [[CdcMerge]]
  * hash-bucketed table whose upserts prune to touched buckets
  * ([[IncrementalRetention]]'s activity grid and
  * [[IncrementalFunnel]]'s per-user state are the worked examples —
  * both migrated off this path). Every caller carries a one-line
  * bound justification at its call site; a new caller must too.
  * The middle ground — state that IS rewritten wholesale per fold by
  * nature (a recomputed frontier) but can outgrow one task — takes
  * [[writeStagedSpread]]: same rename-chain swap, hash-spread files.
  *
  * Why not `insertInto(overwrite)`: a static whole-table overwrite
  * deletes the existing files BEFORE the write job commits, so a crash
  * mid-overwrite destroys the table — including the `_batch` watermark
  * row, which would make the subsequent replay RE-apply its delta
  * against a truncated table instead of skipping it. The rename chain
  * (table→_old, stage→table, drop _old) keeps a complete copy under
  * some name at every instant; [[recover]] restores the name on entry
  * after a crash between the renames.
  *
  * Unpartitioned tables only: a rename moves a managed table's
  * directory wholesale, and (unlike directory-partitioned tables)
  * there is no partition metadata for the catalog to drop.
  */
object TableSwap {

  /** Restore `table` if a crashed [[swapIn]] left it half-swapped
    * (name absent, data under `_old` or the stage). Call before
    * reading state that a swap maintains. */
  def recover(spark: SparkSession, table: String,
      stage: String): Unit = {
    val old = s"${table}_old"
    if (!spark.catalog.tableExists(table)) {
      if (spark.catalog.tableExists(old))
        spark.sql(s"ALTER TABLE $old RENAME TO $table")
      else if (spark.catalog.tableExists(stage))
        // crash after the old table was renamed away and dropped: the
        // staged content is the complete next version — promote it
        spark.sql(s"ALTER TABLE $stage RENAME TO $table")
    }
  }

  /** Stage `df` as `${table}_stage` and swap it in — the one write
    * path for the small maintained tables, so the crash-safety
    * invariant (a complete copy under SOME name at every instant,
    * never a whole-table overwrite) lives in exactly one place. */
  def writeStaged(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val stage = s"${table}_stage"
    CdcMerge.dropStateTable(spark, stage)
    df.coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(stage)
    swapIn(spark, stage, table)
  }

  /** [[writeStaged]] for state that outgrew the 1-file contract but
    * still rewrites WHOLESALE each fold (the anti-correlated skyline
    * frontier: the whole frontier is recomputed per batch, so
    * bucket-pruned upserts buy nothing — the only fix the write path
    * needs is parallelism). The stage is hash-spread on `by` across
    * ~`rowsPerFile`-row files, so no single task ever funnels the
    * state; the swap (rename chain, unpartitioned table) is unchanged
    * — identical crash-safety. `nRows` is the frame's row count (the
    * caller usually just counted it for the gate that routed here). */
  def writeStagedSpread(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, table: String,
      by: org.apache.spark.sql.Column, nRows: Long = -1L,
      rowsPerFile: Long = 32768L): Unit = {
    val stage = s"${table}_stage"
    CdcMerge.dropStateTable(spark, stage)
    val nFiles =
      if (nRows > 0) ((nRows + rowsPerFile - 1) / rowsPerFile).toInt
      else spark.sparkContext.defaultParallelism
    df.repartition(math.max(2, nFiles), by)
      .write.mode("overwrite").format("parquet").saveAsTable(stage)
    swapIn(spark, stage, table)
  }

  /** APPEND-commit for MONOTONE watermark tables — the fold-cadence
    * fast path next to [[writeStaged]]'s rename-chain swap. A batch
    * watermark is written once per fold and read as "the row(s) with
    * the MAX leading column" (every `committed()` reader is already a
    * `max()` aggregate), so the commit does not need to REPLACE
    * anything: appending one tiny row is crash-equivalent (the append
    * job commits atomically; a crash before commit leaves the previous
    * watermark served, exactly like a crash before the swap) and
    * retires the swap's per-fold overhead — a stage saveAsTable, two
    * RENAMEs and three DROPs, measured as a visible slice of every
    * maintained-index fold's fixed driver cost (r16 optimization
    * round).
    *
    * Caller contract: the LEADING column is the monotone commit key
    * (`_batch` / `_wave`), and any other columns ride the same row —
    * readers must take the max-leading row whole (`max(struct(...))`),
    * never per-column maxes across rows, unless each column is itself
    * monotone in the commit key. History rows below the max are dead;
    * once the table accretes past 64 files the append folds them down
    * through the staged swap (rare, control-plane sized). */
  def appendCommit(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val stage = s"${table}_stage"
    recover(spark, table, stage) // heal a legacy staged-swap crash
    if (!spark.catalog.tableExists(table)) {
      // a crashed earlier create may have left a stale directory with
      // no catalog entry — clear it (the writeStaged hygiene)
      CdcMerge.dropStateTable(spark, table)
      df.coalesce(1)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
    } else {
      df.coalesce(1).write.mode("append").insertInto(table)
      // same-session readers hold a cached file listing that predates
      // the append — without this the next committed() read serves a
      // STALE watermark (the staged swap never had the hazard: it
      // re-created the table name each fold)
      spark.catalog.refreshTable(table)
      // bound the accretion (one tiny file per fold): past 64 files,
      // fold history down to the committed rows via the staged swap.
      // File count is a driver-side listing — no job on the hot path.
      if (spark.table(table).inputFiles.length > 64) {
        val lead = spark.table(table).columns.head
        val maxLead = spark.table(table)
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col(lead)))
          .collect()(0)
        if (!maxLead.isNullAt(0)) {
          val keep = spark.table(table)
            .filter(org.apache.spark.sql.functions.col(lead) ===
              maxLead.get(0))
            .localCheckpoint() // pin before the swap renames the source
          writeStaged(spark, keep, table)
        }
      }
    }
  }

  /** Swap the fully-written `stage` table in as `table`. */
  def swapIn(spark: SparkSession, stage: String, table: String): Unit = {
    val old = s"${table}_old"
    // clears a stale directory too (a bare DROP ignores orphan dirs,
    // which would block the rename onto the _old location below)
    CdcMerge.dropStateTable(spark, old)
    if (spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE $table RENAME TO $old")
    else
      // no catalog entry, but a crashed earlier create may have left a
      // stale directory at the target location — the rename below
      // moves the stage directory there and would trip over it
      CdcMerge.dropStateTable(spark, table)
    try spark.sql(s"ALTER TABLE $stage RENAME TO $table")
    catch {
      case e: Throwable =>
        if (!spark.catalog.tableExists(table) &&
            spark.catalog.tableExists(old))
          spark.sql(s"ALTER TABLE $old RENAME TO $table")
        throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS $old")
  }
}
