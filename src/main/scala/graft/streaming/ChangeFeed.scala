package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Change-data-feed over the [[CdcMerge]] state table: every merge
  * additionally records the row-level VISIBLE-STATE diff it caused —
  * `insert` / `update_preimage` / `update_postimage` / `delete` rows,
  * stamped with the batch id — so downstream consumers can read
  * incremental diffs instead of re-diffing snapshots. This is the
  * capability Delta Lake calls CDF, rebuilt here on plain parquet +
  * the merge's own transactional window (reference consumers tail the
  * queue for exactly this; a LATE consumer needs the feed because the
  * queue has moved on — ref `stream_cdc/processing/coordinator.py`).
  *
  * Design for 100 TB:
  *
  *  - The feed table is DIRECTORY-partitioned on `_commit` (the batch
  *    id). Reading "changes since batch N" is a partition-pruned scan
  *    of exactly the requested commits; retention is a metadata-only
  *    partition drop ([[vacuum]]).
  *  - The diff is computed from the merge's before/after rows of the
  *    TOUCHED partitions only (the `beforeCommit` hook), so its cost
  *    is proportional to the batch's footprint, never the table size:
  *    one full-outer join of two already-materialized batch-sized
  *    sides, then a single explode — no second pass.
  *  - Idempotent under at-least-once replay: each batch dynamically
  *    overwrites only its own `_commit` partition. A redelivered batch
  *    that the merge no-ops produces an EMPTY diff which overwrites
  *    nothing, leaving the original rows; a crash between feed write
  *    and state commit replays into a byte-identical overwrite of the
  *    same partition (at hook time the state table still holds the old
  *    rows, so the recomputed diff is the same diff).
  *
  * Diff semantics are over VISIBLE state (tombstones excluded on both
  * sides): a tombstone whose version merely bumps emits nothing; a
  * tombstone replaced by a newer insert emits `insert`; a visible row
  * replaced by a tombstone emits `delete` carrying the pre-image.
  */
object ChangeFeed {

  /** Merge `batch` into `stateTable` (exactly [[CdcMerge.applyBatch]])
    * and append the resulting visible-state diff to `feedTable` under
    * `_commit = batchId`. */
  def applyBatch(spark: SparkSession, stateTable: String,
      feedTable: String, batch: DataFrame, keyCol: String,
      versionCols: Seq[String], nBuckets: Int, batchId: Long,
      opCol: String = "event_type", deleteOp: String = "Delete"): Unit =
    CdcMerge.applyBatch(spark, stateTable, batch, keyCol, versionCols,
      nBuckets, beforeCommit = (oldRows, newRows) =>
        writeChanges(spark, feedTable,
          diff(oldRows, newRows, keyCol, versionCols, opCol, deleteOp),
          batchId))

  /** Visible-state diff between the touched partitions' before
    * (`oldRows`) and after (`newRows`) images. One full-outer join on
    * the key (both sides hold ≤1 row per key — the state invariant),
    * one explode; update rows come out as a pre-image/post-image PAIR
    * like Delta's CDF so consumers can compute column-level deltas. */
  def diff(oldRows: DataFrame, newRows: DataFrame, keyCol: String,
      versionCols: Seq[String], opCol: String, deleteOp: String)
      : DataFrame = {
    val cols = oldRows.columns.filterNot(_ == "_kb").toSeq
    def visible(df: DataFrame, side: String) = df
      .filter(col(opCol) =!= deleteOp)
      .select(cols.map(c => col(c).as(s"${side}_$c")): _*)
    val o = visible(oldRows, "o")
    val n = visible(newRows, "n")
    val joined = o.join(n,
      o(s"o_$keyCol") <=> n(s"n_$keyCol"), "full_outer")
    // same (key, version) on both sides = row untouched by this batch
    // (<=> makes a one-sided row compare false, never null)
    val sameVersion = versionCols
      .map(v => col(s"o_$v") <=> col(s"n_$v"))
      .reduce(_ && _)
    def image(side: String, change: String): Column =
      struct(cols.map(c => col(s"${side}_$c").as(c)) :+
        lit(change).as("_change_type"): _*)
    joined
      .filter(!sameVersion)
      .select(explode(
        when(col(s"o_$keyCol").isNull, array(image("n", "insert")))
          .when(col(s"n_$keyCol").isNull, array(image("o", "delete")))
          .otherwise(array(image("o", "update_preimage"),
            image("n", "update_postimage")))).as("c"))
      .select("c.*")
  }

  /** Write one commit's diff into its own `_commit` partition
    * (replay-idempotent). The commit id is the whole partition spec,
    * so the existing-table path is a fully-STATIC
    * `INSERT OVERWRITE ... PARTITION (_commit=<id>)` — replaces
    * exactly that commit's partition with no dependence on the
    * session-global `partitionOverwriteMode` conf (the
    * [[AppendGrid.writeGeneration]] doctrine; static specs behave
    * identically under either mode). `nFiles` sizes the commit's file
    * count — 1 is right for batch-sized diffs; a bulk backfill commit
    * should pass ceil(diff bytes / target file size) so the feed
    * never accretes shuffle.partitions-many fragments per commit
    * (they are written once and kept until [[vacuum]]). */
  def writeChanges(spark: SparkSession, feedTable: String,
      changes: DataFrame, batchId: Long, nFiles: Int = 1): Unit = {
    if (spark.catalog.tableExists(feedTable)) {
      val dataCols = spark.table(feedTable).columns.toSeq
        .filterNot(_ == "_commit")
      // localCheckpoint, not persist: [[squash]]'s net diff READS the
      // feed table this insert overwrites — the checkpoint
      // materializes the rows and cuts the file lineage, without
      // which the insert is rejected (UNSUPPORTED_OVERWRITE.TABLE)
      val mat = changes.coalesce(nFiles).localCheckpoint(true)
      try {
        // an EMPTY diff must leave the commit's partition untouched —
        // the no-op replay case (redelivery AFTER the state committed
        // diffs old==new): a static INSERT OVERWRITE of zero rows
        // would instead clear the rows the original delivery wrote.
        // The dynamic-overwrite path got this for free (no partitions
        // in the data → none touched); the static spec must check.
        if (mat.isEmpty) return
        val view = s"${feedTable}_chg_src"
        mat.createOrReplaceTempView(view)
        try spark.sql(
          s"INSERT OVERWRITE TABLE $feedTable " +
            s"PARTITION (_commit=$batchId) " +
            s"SELECT ${dataCols.mkString(", ")} FROM $view")
        finally spark.catalog.dropTempView(view)
        spark.catalog.refreshTable(feedTable)
      } finally org.apache.spark.sql.graftbridge.CheckpointBridge
        .freeLocalCheckpoint(mat)
    } else {
      // same stale-location hygiene as the state table's create path
      CdcMerge.dropStateTable(spark, feedTable)
      changes.withColumn("_commit", lit(batchId)).coalesce(nFiles)
        .write.mode("overwrite").format("parquet")
        .partitionBy("_commit").saveAsTable(feedTable)
    }
  }

  /** Changes with `fromBatch <= _commit <= toBatch` — a
    * partition-pruned read of exactly those commits. */
  def readChanges(spark: SparkSession, feedTable: String,
      fromBatch: Long, toBatch: Long = Long.MaxValue): DataFrame = {
    // refresh first: the feed may be appended from a cloned
    // foreachBatch session whose writes don't invalidate THIS
    // session's cached listing — without it a long-lived consumer
    // silently under-reads the newest commits
    spark.catalog.refreshTable(feedTable)
    spark.table(feedTable)
      .filter(col("_commit") >= fromBatch && col("_commit") <= toBatch)
  }

  /** Commit ids of `feedTable`'s partitions in the given range — the
    * feed's control-plane listing, with the range pushed INTO the
    * catalog as a partition predicate (`listPartitionsByFilter`) so a
    * real metastore prunes server-side and the driver never
    * materializes the full commit history (which grows without bound
    * between vacuums; the r6 review flagged the unpruned listing as
    * the feed's only O(commits) driver cost). The in-memory catalog
    * evaluates the same predicate inside the catalog layer. `keep`
    * re-applies the range driver-side as a safety net, and is the
    * fallback filter if the catalog cannot evaluate the predicate. */
  private def commitsMatching(spark: SparkSession, feedTable: String,
      keep: Long => Boolean, lowerInclusive: Option[Long] = None,
      upperExclusive: Option[Long] = None): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference, Cast, Expression, GreaterThanOrEqual,
      LessThan, Literal}
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser
      .parseTableIdentifier(feedTable)
    val dt = catalog.getTableMetadata(ident)
      .partitionSchema("_commit").dataType
    val attr = AttributeReference("_commit", dt, nullable = true)()
    def bound(v: Long): Expression = Cast(Literal(v), dt)
    val preds: Seq[Expression] =
      lowerInclusive.map(l =>
        GreaterThanOrEqual(attr, bound(l)): Expression).toSeq ++
      upperExclusive.map(u => LessThan(attr, bound(u)): Expression)
    val parts =
      try catalog.listPartitionsByFilter(ident, preds)
      catch { case _: Exception => catalog.listPartitions(ident) }
    parts.flatMap(_.spec.get("_commit")).map(_.toLong).filter(keep)
  }

  /** Drop feed partitions with `_commit < keepFrom` — retention as a
    * metadata-only operation (no data rewrite), like any partitioned
    * fact table's TTL. Returns the number of commits dropped.
    *
    * RETENTION CONTRACT (the same one Kafka retention imposes): a
    * consumer whose replay start — [[stateAsOf]]'s as-of point, or a
    * NEW [[applyFeedToAggregate]] view — precedes the retention floor
    * must bootstrap from a state-table snapshot instead of the feed;
    * the journal below `keepFrom` no longer exists, and reading
    * through the gap silently under-counts. Existing consumers whose
    * watermark is already ≥ `keepFrom − 1` are unaffected. */
  def vacuum(spark: SparkSession, feedTable: String,
      keepFrom: Long): Int = {
    if (!spark.catalog.tableExists(feedTable)) return 0
    val stale = commitsMatching(spark, feedTable, _ < keepFrom,
      upperExclusive = Some(keepFrom))
    stale.foreach { c =>
      spark.sql(
        s"ALTER TABLE $feedTable DROP IF EXISTS PARTITION (_commit=$c)")
    }
    stale.length
  }

  /** Reconstruct the visible state AS OF `asOfBatch` from the feed
    * alone — time travel without table snapshots. Per key, the newest
    * change at `_commit <= asOfBatch` decides: post-images and inserts
    * are the row, deletes erase it (pre-images are documentation, not
    * state). One keyed window over the partition-pruned commit range;
    * cost scales with the changes up to the as-of point, and the
    * common "state right before the bad deploy" query prunes to a
    * short commit range on top of the retained feed.
    *
    * Completeness contract (spec-pinned): `stateAsOf(latest)` equals
    * [[CdcMerge.readState]] — the feed is a lossless journal of the
    * state table. */
  def stateAsOf(spark: SparkSession, feedTable: String, keyCol: String,
      asOfBatch: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_commit").desc)
    spark.catalog.refreshTable(feedTable) // cross-session listing guard
    spark.table(feedTable)
      .filter(col("_commit") <= asOfBatch &&
        col("_change_type") =!= "update_preimage")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_change_type") =!= "delete")
      .drop("_rn", "_change_type", "_commit")
  }

  /** Squash the commit range `[fromBatch, toBatch]` into ONE net-diff
    * partition at `_commit = toBatch` — log compaction for the feed:
    * long-retention journals grow with commit count, and history far
    * behind every consumer only needs its NET effect. The squashed
    * partition is `diff(stateAsOf(fromBatch−1), stateAsOf(toBatch))`,
    * so keys whose changes cancelled inside the range (insert→delete)
    * vanish entirely and ping-ponging keys keep one update pair.
    * Returns the number of commit partitions dropped.
    *
    * Contracts (both the vacuum retention contract, tightened):
    *  - point-in-time reads INSIDE the squashed range are gone —
    *    `stateAsOf(c)` for `fromBatch ≤ c < toBatch` now answers as of
    *    `fromBatch−1`; reads at ≥ toBatch or < fromBatch are
    *    unchanged (spec-pinned).
    *  - consumers must be at watermark < fromBatch or ≥ toBatch.
    *  - single-writer maintenance window; a crash between the net-diff
    *    write and the partition drops leaves stateAsOf correct (the
    *    newest-change-wins read makes leftovers harmless) but a
    *    consumer polling that in-between state would double-count —
    *    re-run the squash to completion before resuming consumers. */
  def squash(spark: SparkSession, feedTable: String, keyCol: String,
      versionCols: Seq[String], fromBatch: Long, toBatch: Long,
      opCol: String = "event_type", deleteOp: String = "Delete"): Int = {
    require(fromBatch <= toBatch, s"squash: $fromBatch > $toBatch")
    val before = stateAsOf(spark, feedTable, keyCol, fromBatch - 1)
    val after = stateAsOf(spark, feedTable, keyCol, toBatch)
    val net = diff(before, after, keyCol, versionCols, opCol, deleteOp)
    // an EMPTY net diff (range changes cancel exactly) must CLEAR the
    // toBatch partition, not keep its original rows: writeChanges'
    // empty-skip exists for the no-op REDELIVERY case, but here the
    // leftover rows would be spurious changes whose pre-images are
    // relative to toBatch-1 instead of fromBatch-1 (the r15 advice).
    // stateAsOf stays correct either way; consumers of the squashed
    // journal would double-read.
    //
    // DROP ORDER is load-bearing for crash convergence. Partitions go
    // ASCENDING with toBatch LAST: at any crash point each key's
    // surviving newest change ≤ toBatch is either its true newest
    // (newest-wins reads its post-range value) or every range change
    // for that key is already gone (reads its pre-range value — equal
    // by net-emptiness), so stateAsOf(≥ toBatch) stays exact through
    // the whole window and a re-run recomputes the same empty net and
    // finishes the drops. Dropping toBatch FIRST instead un-shadows
    // the older range commits: a crash then has stateAsOf(toBatch)
    // reading a mid-range state, and the re-run BAKES that wrong
    // state into a fresh net diff — non-convergent.
    val stale = commitsMatching(spark, feedTable,
      c => c >= fromBatch && c < toBatch,
      lowerInclusive = Some(fromBatch), upperExclusive = Some(toBatch))
      .sorted
    if (net.isEmpty) {
      (stale :+ toBatch).foreach { c =>
        spark.sql(s"ALTER TABLE $feedTable DROP IF EXISTS " +
          s"PARTITION (_commit=$c)")
      }
    } else {
      // non-empty: the net lands at toBatch FIRST (overwrite), so
      // every key it names is covered before any shadow drops; keys
      // not in the net rely on the same ascending newest-last order
      writeChanges(spark, feedTable, net, toBatch)
      stale.foreach { c =>
        spark.sql(s"ALTER TABLE $feedTable DROP IF EXISTS " +
          s"PARTITION (_commit=$c)")
      }
    }
    stale.length
  }

  /** Maintain a per-group (n_live, sum_value) aggregate by TAILING
    * THE FEED — the decoupled CDF-consumer pattern: the merge pipeline
    * owns the state table; any number of derived views update later
    * from the journal without ever reading (or contending on) state.
    *
    * A feed row IS a signed contribution: insert/update_postimage
    * add a visible row (+1), delete/update_preimage remove one (−1) —
    * so the delta for a commit range is one partial-aggregated pass
    * over the partition-pruned feed slice. The aggregate table carries
    * the last-applied commit in `_batch`; calls re-applying an
    * already-covered range no-op, so consumers can poll with overlap
    * (at-least-once tailing) and stay exact. Sums accumulate in
    * DECIMAL (exact, order-independent — the IncrementalAgg
    * contract).
    *
    * @param groupOf  grouping expression over the feed's row columns
    *                 (e.g. a value bucket); evaluated per change row
    * @param upTo     apply commits `(last applied, upTo]`
    */
  def applyFeedToAggregate(spark: SparkSession, feedTable: String,
      aggTable: String, groupOf: Column, valueCol: String,
      upTo: Long): Unit = {
    import org.apache.spark.sql.types.DecimalType
    // polling before the first merge commit is a no-op, not an error
    if (!spark.catalog.tableExists(feedTable)) return
    TableSwap.recover(spark, aggTable, s"${aggTable}_stage")
    val exists = spark.catalog.tableExists(aggTable)
    val last = if (exists)
      spark.table(aggTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
    else -1L
    // clamp to what the feed has actually committed: advancing the
    // watermark past unwritten commits would silently skip them when
    // they later arrive (the sloppy-poller hazard). Partition-column
    // read — metadata-sized.
    val maxCommit = spark.table(feedTable)
      .agg(coalesce(max("_commit"), lit(-1L))).collect()(0).getLong(0)
    val effUpTo = math.min(upTo, maxCommit)
    if (effUpTo <= last) return
    val d20 = DecimalType(20, 2)
    val zero = lit(java.math.BigDecimal.ZERO).cast(d20)
    val deltas = readChanges(spark, feedTable, last + 1, effUpTo)
      .select(groupOf.as("g"),
        when(col("_change_type").isin("insert", "update_postimage"),
          lit(1L)).otherwise(lit(-1L)).as("sign"),
        col(valueCol).cast(DecimalType(12, 2)).cast(d20).as("v"))
      .groupBy("g")
      .agg(sum(col("sign")).as("dn"),
        sum((col("v") * col("sign")).cast(d20)).cast(d20).as("dv"))
    val updated = (if (exists)
        TableSwap.readVersioned(spark, aggTable).drop("_batch")
          .withColumnRenamed("g", "sg")
          .join(deltas, col("sg") === col("g"), "full_outer")
          .select(coalesce(col("g"), col("sg")).as("g"),
            (coalesce(col("n_live"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n_live"),
            (coalesce(col("sum_value"), zero) +
              coalesce(col("dv"), zero)).cast(d20).as("sum_value"))
      else
        deltas.select(col("g"), col("dn").as("n_live"),
          col("dv").as("sum_value")))
      // drained groups stay as watermark carriers (readAggregate
      // filters), the IncrementalAgg invariant
      .withColumn("_batch", lit(effUpTo))
    // bound: groups-ever-seen (enum-like group key — caller
    // contract); corpus-keyed groups belong in CdcMerge. Full next
    // version append-commits stamped with _batch (the IncrementalAgg
    // shape — identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, updated, aggTable)
  }

  /** Read the feed-maintained aggregate (watermark dropped, drained
    * groups filtered) — the same contract as the hook-coupled view. */
  def readAggregate(spark: SparkSession, aggTable: String): DataFrame =
    IncrementalAgg.readAgg(spark, aggTable)

  /** Continuous apply with feed: [[CdcMerge.startMergeStream]] plus
    * per-batch CDF capture keyed by foreachBatch's batch id. */
  def startMergeStream(df: DataFrame, stateTable: String,
      feedTable: String, keyCol: String, versionCols: Seq[String],
      nBuckets: Int, checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, stateTable, feedTable, batch,
          keyCol, versionCols, nBuckets, batchId)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
