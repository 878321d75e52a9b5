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
      if (spark.catalog.tableExists(old)) {
        spark.sql(s"ALTER TABLE $old RENAME TO $table")
        CdcMerge.invalidateProps(table)
      } else if (spark.catalog.tableExists(stage)) {
        // crash after the old table was renamed away and dropped: the
        // staged content is the complete next version — promote it
        spark.sql(s"ALTER TABLE $stage RENAME TO $table")
        CdcMerge.invalidateProps(table)
      }
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
      df: org.apache.spark.sql.DataFrame, table: String): Unit =
    appendCommitLead(spark, df, table, None)

  /** [[appendCommit]] generalized to VERSIONED bounded state — the
    * append-commit fast path extended from 1-row watermarks to whole
    * state versions: `df` is the COMPLETE next version of a
    * control-plane-sized state table, every row stamped with the same
    * monotone `lead` value (`_batch`). The commit appends the version
    * (one atomic write job) instead of staging + swapping it in (a
    * stage saveAsTable, two RENAMEs and three DROPs per fold — the
    * same fixed driver cost the watermark append retired in r16, paid
    * here by every maintained-aggregate/sketch fold). Readers take
    * the max-`lead` version WHOLE via [[readVersioned]]; rows below
    * the max are dead history, folded down past 64 files. Crash
    * contract unchanged from the swap: the append commits atomically,
    * so a crash mid-commit leaves the previous version served — and
    * the version's own `lead` stamp doubles as the idempotence
    * watermark, exactly as before. SIZE CONTRACT as [[writeStaged]]:
    * bounded state only (the history multiplies storage by ≤64). */
  def appendVersioned(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, table: String,
      lead: String = "_batch"): Unit =
    appendCommitLead(spark, df, table, Some(lead))

  /** The max-`lead` version of an [[appendVersioned]] table, whole:
    * a broadcast equi-join against the 1-row max-`lead` aggregate —
    * no extra action, no single-task global window (the PlanQuality
    * gate), two scans of a table the size contract keeps tiny. */
  def readVersioned(spark: SparkSession, table: String,
      lead: String = "_batch"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, max}
    val t = spark.table(table)
    t.join(
        broadcast(t.groupBy().agg(max(col(lead)).as("_lead_max"))),
        col(lead) === col("_lead_max"))
      .drop("_lead_max")
  }

  private def appendCommitLead(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, table: String,
      lead: Option[String]): Unit = {
    val stage = s"${table}_stage"
    recover(spark, table, stage) // heal a legacy staged-swap crash
    if (!spark.catalog.tableExists(table)) {
      // a crashed earlier create may have left a stale directory with
      // no catalog entry — clear it (the writeStaged hygiene)
      CdcMerge.dropStateTable(spark, table)
      df.coalesce(1)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      fileCounts(spark).put(table, 1)
    } else {
      df.coalesce(1).write.mode("append").insertInto(table)
      // same-session readers hold a cached file listing that predates
      // the append — without this the next committed() read serves a
      // STALE watermark (the staged swap never had the hazard: it
      // re-created the table name each fold)
      spark.catalog.refreshTable(table)
      // bound the accretion (one tiny file per fold): past 64 files,
      // fold history down to the committed rows via the staged swap.
      // The count is a session-local counter seeded from ONE listing
      // per table (a fresh session inherits an unknown file count) —
      // the previous per-fold `inputFiles` listing was a real
      // per-fold metadata round-trip on object stores.
      val counts = fileCounts(spark)
      val n = counts.getOrDefault(table, -1) match {
        case -1 => spark.table(table).inputFiles.length + 1
        case c  => c + 1
      }
      counts.put(table, n)
      if (n > 64) {
        val leadCol = lead.getOrElse(spark.table(table).columns.head)
        val maxLead = spark.table(table)
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col(leadCol)))
          .collect()(0)
        if (!maxLead.isNullAt(0)) {
          val keep = spark.table(table)
            .filter(org.apache.spark.sql.functions.col(leadCol) ===
              maxLead.get(0))
            .localCheckpoint() // pin before the swap renames the source
          // the fold-down swap pins `keep` across the rename chain;
          // release its blocks once the swap holds the data (they
          // otherwise accumulate one per fold-down for the session)
          try writeStaged(spark, keep, table)
          finally {
            org.apache.spark.sql.graftbridge.CheckpointBridge
              .freeLocalCheckpoint(keep)
            ()
          }
          counts.put(table, 1)
        }
      }
    }
  }

  // per-session append-file counters for [[appendCommit]]'s accretion
  // bound: value = file count after the latest append (-1 sentinel =
  // unseen). Weak keys so a discarded session's map can be collected.
  private val appendFiles = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Int]]())

  private def fileCounts(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, Int] =
    appendFiles.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Int]())

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
        CdcMerge.invalidateProps(table)
        throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS $old")
    // the swapped-in table carries the STAGE's properties
    CdcMerge.invalidateProps(table)
  }
}
