package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental statistics maintenance over the [[CdcMerge]] state
  * table: per-group count / sum / sum-of-squares / MIN / MAX — the
  * full [[IncrementalAgg]] idea extended to the aggregates that are
  * NOT self-inverting under deletion. Derived values (avg, variance,
  * stddev) come out of the sufficient statistics in closed form.
  *
  * What each aggregate needs under CDC (inserts AND deletes):
  *
  *  - count / sum / sum² are ABELIAN-GROUP aggregates — a deletion is
  *    the negated contribution, so the batch's state transition
  *    (additions − removals, from [[ChangeFeed.diff]]) maintains them
  *    exactly, like IncrementalAgg. Values are ×100-scaled exact longs
  *    accumulated in DECIMAL(38,0) (the q37 determinism recipe:
  *    associative, order-independent, no float drift).
  *  - MIN / MAX are only SEMILATTICE aggregates — an insert merges in
  *    O(1) (`least`/`greatest`), but deleting the current extremum
  *    invalidates the stored value. The classic MV-maintenance answer,
  *    used here: keep the monoid fast path for additions, and RESCAN
  *    ONLY the groups whose removals touch their stored boundary
  *    (removed value ≤ stored min or ≥ stored max). Removals strictly
  *    inside the open interval can't change the extrema and cost
  *    nothing. The rescan reads the post-merge state (untouched
  *    partitions ∪ staged touched partitions) filtered to the dirty
  *    groups by a broadcast semi-join — work scales with the dirty
  *    groups' data, never the table.
  *
  * Crash-safety is word-for-word IncrementalAgg's: deltas derive from
  * the state TRANSITION inside [[CdcMerge.applyBatch]]'s beforeCommit
  * window (state table still old → replay recomputes the same deltas),
  * the `_batch` watermark makes re-application a no-op, and the
  * groups-sized table swaps in via the [[TableSwap]] rename chain.
  */
object IncrementalStats {

  /** Read the maintained statistics with derived values: n_live,
    * sum/min/max/avg/var_pop/stddev_pop as doubles de-scaled from the
    * exact ×100 statistics — the same closed forms, textually, as the
    * cdc20 oracle. */
  def readStats(spark: SparkSession, aggTable: String): DataFrame = {
    TableSwap.recover(spark, aggTable, s"${aggTable}_stage")
    // cross-session listing guard (see IncrementalAgg.readAgg)
    spark.catalog.refreshTable(aggTable)
    val nd = col("n_live").cast("double")
    val svd = col("sv").cast("double")
    val sqd = col("sq").cast("double")
    // versions append-commit (TableSwap.appendVersioned); serve the
    // max-_batch version whole
    TableSwap.readVersioned(spark, aggTable).filter(col("n_live") > 0)
      .select(col("g"), col("n_live"),
        (svd / 100.0).as("sum_value"),
        (col("mn").cast("double") / 100.0).as("min_value"),
        (col("mx").cast("double") / 100.0).as("max_value"),
        (svd / nd / 100.0).as("avg_value"),
        ((sqd - svd * svd / nd) / nd / 1.0e4).as("var_pop"),
        sqrt((sqd - svd * svd / nd) / nd / 1.0e4).as("stddev_pop"))
  }

  /** Merge `batch` into `stateTable` AND maintain `aggTable`'s
    * statistics incrementally. `valueCol` carries ≤2 decimal places by
    * contract (the ×100 scaling is then exact). */
  def applyBatch(spark: SparkSession, stateTable: String,
      aggTable: String, batch: DataFrame, keyCol: String,
      versionCols: Seq[String], nBuckets: Int, groupCol: String,
      valueCol: String, batchId: Long, opCol: String = "event_type",
      deleteOp: String = "Delete"): Unit =
    CdcMerge.applyBatch(spark, stateTable, batch, keyCol, versionCols,
      nBuckets, beforeCommit = (oldRows, newRows) => {
        // post-merge full state at hook time: the state table's
        // UNTOUCHED partitions (still current) ∪ the staged touched
        // partitions. Touched ids come off the stage — metadata-sized,
        // bounded by nBuckets.
        val touched = newRows.select("_kb").distinct()
          .collect().map(_.getLong(0))
        val newFullState =
          if (spark.catalog.tableExists(stateTable))
            spark.table(stateTable)
              .filter(!col("_kb").isin(touched.toSeq: _*))
              .unionByName(newRows)
          else newRows
        applyStats(spark, aggTable, newFullState, oldRows, newRows,
          keyCol, versionCols, groupCol, valueCol, batchId, opCol,
          deleteOp)
      })

  /** Continuous maintenance: foreachBatch [[applyBatch]] keyed by the
    * micro-batch id — the streaming twin of
    * [[CdcMerge.startMergeStream]], with the statistics view kept
    * transactionally consistent with the state table batch by batch. */
  def startStatsStream(df: DataFrame, stateTable: String,
      aggTable: String, keyCol: String, versionCols: Seq[String],
      nBuckets: Int, groupCol: String, valueCol: String,
      checkpointDir: String, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, stateTable, aggTable, batch,
          keyCol, versionCols, nBuckets, groupCol, valueCol, batchId)
        ()
      }
    (if (availableNow)
      writer.trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** Apply one batch's transition to the statistics table. Exposed for
    * the conformance spec; use [[applyBatch]] in pipelines. */
  def applyStats(spark: SparkSession, aggTable: String,
      newFullState: DataFrame, oldRows: DataFrame, newRows: DataFrame,
      keyCol: String, versionCols: Seq[String], groupCol: String,
      valueCol: String, batchId: Long, opCol: String,
      deleteOp: String): Unit = {
    TableSwap.recover(spark, aggTable, s"${aggTable}_stage")
    val exists = spark.catalog.tableExists(aggTable)
    if (exists) {
      val last = spark.table(aggTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    def x(c: Column): Column = round(c * 100).cast("long")
    val d38 = DecimalType(38, 0)

    // the transition: additions (+1) and removals (−1) of visible rows
    val changes = ChangeFeed.diff(oldRows, newRows, keyCol, versionCols,
      opCol, deleteOp)
      .select(col(groupCol).as("g"), x(col(valueCol)).as("x"),
        when(col("_change_type").isin("insert", "update_postimage"),
          lit(1L)).otherwise(lit(-1L)).as("sign"))
    val deltas = changes.groupBy("g").agg(
      sum(col("sign")).as("dn"),
      sum((col("x") * col("sign")).cast(d38)).as("dv"),
      // x² must multiply in DECIMAL, not long: x ≤ 1e14 inside the
      // DECIMAL(12,2) envelope, so a long x*x overflows 2^63 at
      // values ≥ ~9.2e18 (ANSI abort or silent wrap). The decimal
      // product (≤1e28) is exact in DECIMAL(38,0) — and matches the
      // cdc20 oracle's HUGEINT multiply.
      sum((col("x").cast(d38) * col("x") * col("sign")).cast(d38))
        .as("dq"),
      min(when(col("sign") > 0, col("x"))).as("add_mn"),
      max(when(col("sign") > 0, col("x"))).as("add_mx"),
      min(when(col("sign") < 0, col("x"))).as("rm_mn"),
      max(when(col("sign") < 0, col("x"))).as("rm_mx"))

    val zero = lit(java.math.BigDecimal.ZERO).cast(d38)
    val stored = if (exists)
      TableSwap.readVersioned(spark, aggTable).drop("_batch")
        .withColumnRenamed("g", "sg")
    else
      deltas.limit(0).select(col("g").as("sg"), col("dn").as("n_live"),
        col("dv").as("sv"), col("dq").as("sq"),
        col("add_mn").as("mn"), col("add_mx").as("mx"))
    val joined = stored.join(deltas, col("sg") === col("g"),
      "full_outer")
      .select(
        coalesce(col("g"), col("sg")).as("g"),
        (coalesce(col("n_live"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_new"),
        (coalesce(col("sv"), zero) + coalesce(col("dv"), zero))
          .cast(d38).as("sv_new"),
        (coalesce(col("sq"), zero) + coalesce(col("dq"), zero))
          .cast(d38).as("sq_new"),
        col("mn"), col("mx"), col("add_mn"), col("add_mx"),
        // a removal at (or beyond) the stored boundary may have taken
        // the extremum with it → the group must rescan. A stored row
        // with NULL extrema (previously drained) that sees removals
        // can't happen (removals imply visible rows existed), but the
        // null-safe <= keeps it dirty rather than silently wrong.
        (col("rm_mn").isNotNull &&
          (col("mn").isNull || col("rm_mn") <= col("mn") ||
            col("rm_mx") >= col("mx"))).as("dirty"))

    // rescan ONLY dirty groups over the post-merge state (visible
    // rows); dirty groups are few — broadcast them into a semi-joinable
    // lookup so the scan stays one pass with no extra shuffle of state
    val dirtyGroups = joined.filter(col("dirty") && col("n_new") > 0)
      .select(col("g").as("rg"))
    val rescan = newFullState
      .filter(col(opCol) =!= deleteOp)
      .join(broadcast(dirtyGroups), col(groupCol) === col("rg"),
        "left_semi")
      .groupBy(col(groupCol).as("rg"))
      .agg(min(x(col(valueCol))).as("r_mn"),
        max(x(col(valueCol))).as("r_mx"))

    val updated = joined
      .join(broadcast(rescan), col("g") === col("rg"), "left_outer")
      .select(col("g"), col("n_new").as("n_live"),
        col("sv_new").as("sv"), col("sq_new").as("sq"),
        when(col("n_new") <= 0, lit(null))
          .when(col("dirty"), col("r_mn"))
          .otherwise(least(col("mn"), col("add_mn"))).as("mn"),
        when(col("n_new") <= 0, lit(null))
          .when(col("dirty"), col("r_mx"))
          .otherwise(greatest(col("mx"), col("add_mx"))).as("mx"))
      // drained groups stay as rows to carry the watermark (the
      // IncrementalAgg invariant); readStats filters them
      .withColumn("_batch", lit(batchId))

    // bound: groups-ever-seen (enum-like group key — caller
    // contract); corpus-keyed groups belong in CdcMerge. Full next
    // version append-commits stamped with _batch (one atomic write
    // instead of the staged swap's stage write + renames + drops per
    // fold — the IncrementalAgg reasoning, identical crash contract)
    TableSwap.appendVersioned(spark, updated, aggTable)
  }
}
