package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance: a per-group (n_live, sum_value)
  * materialized view over the [[CdcMerge]] latest-state table, updated
  * from each change batch's state TRANSITION instead of rescanning the
  * table — the materialized-view-maintenance operator every CDC
  * consumer eventually builds.
  *
  * Design:
  *
  *  - The delta of a batch is `contribution(newRows) −
  *    contribution(oldRows)` over the touched partitions, where a
  *    row's contribution is (1, value) grouped by ITS OWN group value
  *    (tombstones contribute zero). Rows untouched by the merge appear
  *    identically on both sides and cancel exactly (sums run in
  *    DECIMAL — exact, order-independent), so group MOVES (an update
  *    that changes the row's group) debit the old group and credit the
  *    new one with no special casing.
  *  - Deltas are derived from the state transition, not the batch
  *    content, so a redelivered batch that the merge no-ops produces
  *    an all-zero delta. On top of that, the agg table carries the
  *    last-applied `_batch` watermark and skips any batchId already
  *    applied — which makes the three crash windows safe given
  *    [[CdcMerge.applyBatch]]'s hook ordering (agg update BEFORE state
  *    commit): crash before agg write → replay recomputes the same
  *    delta; crash between agg write and state commit → replay skips
  *    the agg (watermark) and commits the state; crash after both →
  *    replay no-ops both.
  *  - The agg table is groups-sized (tiny); each batch stages the full
  *    next version and swaps it in via the [[TableSwap]] rename chain,
  *    so a complete copy exists under some name at every instant. The
  *    expensive side — the delta — is one partial-aggregated pass over
  *    the touched partitions already materialized by the merge.
  */
object IncrementalAgg {

  /** Read the maintained aggregate (watermark column dropped, drained
    * groups filtered — rows with `n_live` 0 are retained physically
    * only to carry the idempotence watermark, see [[applyDeltas]]). */
  def readAgg(spark: SparkSession, aggTable: String): DataFrame = {
    TableSwap.recover(spark, aggTable, s"${aggTable}_stage")
    // the maintaining stream commits from a cloned session; refresh so
    // this session's cached listing can't serve a pre-commit version
    spark.catalog.refreshTable(aggTable)
    // versions append-commit (TableSwap.appendVersioned); serve the
    // max-_batch version whole
    TableSwap.readVersioned(spark, aggTable)
      .filter(col("n_live") > 0).drop("_batch")
  }

  /** Merge `batch` into `stateTable` AND maintain `aggTable`
    * incrementally, in the crash-safe order described above.
    *
    * @param groupCol column of the envelope to aggregate by (must be
    *                 part of the envelope flowing into the state table)
    * @param valueCol numeric column summed per group (exact DECIMAL
    *                 accumulation; ≤2 decimal places by contract)
    * @param batchId  monotone batch id (foreachBatch's), the
    *                 idempotence watermark
    */
  def applyBatch(spark: SparkSession, stateTable: String,
      aggTable: String, batch: DataFrame, keyCol: String,
      versionCols: Seq[String], nBuckets: Int, groupCol: String,
      valueCol: String, batchId: Long, opCol: String = "event_type",
      deleteOp: String = "Delete"): Unit =
    CdcMerge.applyBatch(spark, stateTable, batch, keyCol, versionCols,
      nBuckets, beforeCommit = (oldRows, newRows) =>
        applyDeltas(spark, aggTable, oldRows, newRows, groupCol,
          valueCol, batchId, opCol, deleteOp))

  /** Apply `contribution(newRows) − contribution(oldRows)` to the agg
    * table, unless `batchId` was already applied (watermark no-op). */
  def applyDeltas(spark: SparkSession, aggTable: String,
      oldRows: DataFrame, newRows: DataFrame, groupCol: String,
      valueCol: String, batchId: Long, opCol: String,
      deleteOp: String): Unit = {
    TableSwap.recover(spark, aggTable, s"${aggTable}_stage")
    val exists = spark.catalog.tableExists(aggTable)
    if (exists) {
      val last = spark.table(aggTable)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    def contrib(df: DataFrame, sign: Int) = df.select(
      col(groupCol).as("g"),
      when(col(opCol) === deleteOp, lit(0L))
        .otherwise(lit(sign.toLong)).as("dn"),
      when(col(opCol) === deleteOp,
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(20, 2)))
        .otherwise(col(valueCol).cast(DecimalType(12, 2))
          .cast(DecimalType(20, 2)) * sign).as("dv"))
    val deltas = contrib(newRows, 1).unionByName(contrib(oldRows, -1))
      .groupBy("g")
      .agg(sum(col("dn")).as("dn"),
        sum(col("dv")).cast(DecimalType(20, 2)).as("dv"))
    val updated = (if (exists)
        TableSwap.readVersioned(spark, aggTable).drop("_batch")
          .join(deltas, col(groupCol) === col("g"), "full_outer")
          .select(
            coalesce(col(groupCol), col("g")).as(groupCol),
            (coalesce(col("n_live"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n_live"),
            (coalesce(col("sum_value"),
                lit(java.math.BigDecimal.ZERO).cast(DecimalType(20, 2))) +
              coalesce(col("dv"),
                lit(java.math.BigDecimal.ZERO).cast(DecimalType(20, 2))))
              .cast(DecimalType(20, 2)).as("sum_value"))
      else
        deltas.select(col("g").as(groupCol), col("dn").as("n_live"),
          col("dv").cast(DecimalType(20, 2)).as("sum_value")))
      // Drained groups (n_live 0) are KEPT as rows: the idempotence
      // watermark is max(_batch) over the table, so dropping the last
      // live group would drop the watermark with it — a crash between
      // agg write and state commit would then RE-apply the delta on
      // replay instead of skipping it. readAgg filters them out; the
      // table stays groups-ever-seen-sized (still metadata-scale).
      .withColumn("_batch", lit(batchId))
    // bound: groups-ever-seen — the group key must be enum-like
    // (caller contract); corpus-keyed groups belong in CdcMerge.
    // The full next version APPEND-commits stamped with its _batch
    // (TableSwap.appendVersioned): one atomic write job instead of
    // the staged rename-chain swap's per-fold stage write + 2 RENAMEs
    // + 3 DROPs. Crash contract unchanged — a crash before the append
    // job commits leaves the previous version (and watermark) served,
    // and the replay recomputes the identical delta.
    TableSwap.appendVersioned(spark, updated, aggTable)
  }
}
