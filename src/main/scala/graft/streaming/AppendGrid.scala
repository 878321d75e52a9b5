package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for APPEND-pattern state grids — tables
  * directory-partitioned on (`_b` = batch generation, `_kb` = hash
  * bucket) where each fold dynamic-overwrites only its own `_b`
  * generation ([[IncrementalSpans]]' span grid, [[IncrementalDocFreq]]'s
  * df deltas). Two services every such grid needs, kept in ONE place
  * because their crash-safety subtleties are identical:
  *
  *  - [[recover]]: restore the grid's name after a crash between
  *    [[compact]]'s two renames (the TableSwap.recover analogue for
  *    the generation-table rename chain) — without it, the next fold
  *    would silently recreate a fresh one-batch grid while the
  *    surviving watermark forever skips re-folding the lost batches;
  *  - [[compact]]: fold all generations into the newest one, FENCED
  *    on the batch watermark — compacting a generation whose batch is
  *    still inside the crash window (grid written, watermark not)
  *    would let that batch's replay dynamic-overwrite the compacted
  *    generation and silently destroy history, so compact REFUSES
  *    until the in-flight batch is re-delivered.
  *
  * Single-writer contract (like any non-transactional table service):
  * pause the ingest stream around [[compact]]. */
object AppendGrid {

  private def rename(spark: SparkSession, from: String,
      to: String): Unit = {
    // renaming a directory-partitioned managed table drops partition
    // metadata (the rebucket finding) — repair after every rename
    spark.sql(s"ALTER TABLE $from RENAME TO $to")
    spark.sql(s"MSCK REPAIR TABLE $to")
  }

  /** Replace generation `_b = batchId` of `table` with `deltas` — the
    * ONE write path every append-grid fold shares. A static-prefix
    * `INSERT OVERWRITE ... PARTITION (_b=<id>, _kb)` replaces exactly
    * the batch's own generation subtree (every `_kb` under it,
    * including partitions the new data lacks) and touches no other
    * generation — idempotent through the crash window like the old
    * dynamic overwrite, but with NO dependence on the session-global
    * `partitionOverwriteMode` conf: a concurrent writer restoring
    * that conf mid-write (two ingest streams on one session — the
    * r13 advice) can no longer turn this into a whole-table static
    * overwrite. The repartition clusters each bucket into one task →
    * one file per bucket per fold. `dataCols` are the table's
    * non-partition columns, in schema order. */
  def writeGeneration(spark: SparkSession, table: String,
      deltas: DataFrame, batchId: Long, dataCols: Seq[String]): Unit = {
    val view = s"${table}_gen_src"
    deltas.repartition(col("_kb")).createOrReplaceTempView(view)
    try spark.sql(
      s"INSERT OVERWRITE TABLE $table PARTITION (_b=$batchId, _kb) " +
        s"SELECT ${dataCols.mkString(", ")}, _kb FROM $view")
    finally spark.catalog.dropTempView(view)
    spark.catalog.refreshTable(table)
  }

  /** Restore `table` if a crashed [[compact]] left it half-swapped:
    * prefer the fully-written compacted stage (`_compacting` —
    * complete before any rename starts, and it carries the graft.*
    * lifetime properties), else the renamed-away original (`_old`).
    * Call before ANY read of or fold into the grid. */
  def recover(spark: SparkSession, table: String): Unit = {
    val tmp = s"${table}_compacting"
    val old = s"${table}_old"
    if (!spark.catalog.tableExists(table)) {
      if (spark.catalog.tableExists(tmp)) rename(spark, tmp, table)
      else if (spark.catalog.tableExists(old))
        rename(spark, old, table)
    }
  }

  /** Fold all `_b` generations of `table` into the newest one — one
    * file per bucket again. `fold(grid, maxB)` builds the compacted
    * frame (identity re-stamp for immutable-row grids, a delta SUM
    * for additive grids); it must keep the (`_b`, `_kb`) columns with
    * `_b = maxB`. The rewrite stages to `_compacting`, carries every
    * `graft.*` table property, and swaps in via the crash-recoverable
    * rename chain. Fenced: refuses while the newest generation's
    * batch is inside the crash window (see object doc).
    *
    * `sortCols`: sort order WITHIN each compacted bucket file —
    * sorting by the grid's key column gives every row group a tight
    * parquet min/max on that key, so later point-probes
    * ([[IncrementalSpans.removalView]]'s compacted-singleton check)
    * can skip row groups instead of scanning the bucket.
    *
    * Returns the compacted generation id (`maxB`). */
  def compact(spark: SparkSession, table: String,
      fold: (DataFrame, Long) => DataFrame,
      sortCols: Seq[String] = Nil): Long = {
    recover(spark, table)
    spark.catalog.refreshTable(table)
    val maxB = spark.table(table)
      .agg(coalesce(max("_b"), lit(0L))).collect()(0).getLong(0)
    val wmT = s"${table}_wm"
    TableSwap.recover(spark, wmT, s"${wmT}_stage")
    if (spark.catalog.tableExists(wmT)) {
      val last = spark.table(wmT)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0)
        .getLong(0)
      require(maxB <= last,
        s"$table holds generation _b=$maxB above the batch " +
          s"watermark ($last): that batch's crash window is open — " +
          "re-deliver it (the fold is idempotent) before compacting, " +
          "or its replay would dynamic-overwrite the compacted " +
          "generation and destroy history")
    }
    val props = CdcMerge.graftProps(spark, table)
    val tmp = s"${table}_compacting"
    val old = s"${table}_old"
    CdcMerge.dropStateTable(spark, tmp)
    CdcMerge.dropStateTable(spark, old)
    val folded = fold(spark.table(table), maxB).repartition(col("_kb"))
    (if (sortCols.isEmpty) folded
     else folded.sortWithinPartitions(sortCols.map(col): _*))
      .write.mode("overwrite").format("parquet")
      .partitionBy("_b", "_kb").saveAsTable(tmp)
    // properties ride on the stage BEFORE the swap, so a recovery
    // that promotes the stage keeps them
    props.foreach { case (k, v) =>
      CdcMerge.setTableProp(spark, tmp, k, v)
    }
    // partition count the swap must end up registering — verified
    // after the repair, because an ALTER whose MSCK fails leaves the
    // grid silently readable-as-empty (the r13 advice)
    val expParts = spark.sql(s"SHOW PARTITIONS $tmp").count()
    rename(spark, table, old)
    try spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    catch {
      case e: Throwable =>
        // the ALTER failed whole — the target name is still free, so
        // rolling the original back is safe (and cannot itself fail
        // with TABLE_ALREADY_EXISTS, the masking bug this replaces)
        if (!spark.catalog.tableExists(table)) rename(spark, old, table)
        throw e
    }
    // the ALTER landed: the compacted data IS the grid now, and a
    // rollback rename would collide with the taken name. Verify the
    // repair registered every partition (retrying the MSCK once);
    // only on verified failure demote — drop the half-registered
    // compacted copy (derivable: `old` still holds the full grid) and
    // restore the original, surfacing the real error unmasked.
    try {
      try spark.sql(s"MSCK REPAIR TABLE $table")
      catch { case _: Throwable =>
        spark.sql(s"MSCK REPAIR TABLE $table") }
      val got = spark.sql(s"SHOW PARTITIONS $table").count()
      require(got == expParts,
        s"compact($table): swap registered $got partitions, " +
          s"expected $expParts")
    } catch {
      case e: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS $table")
        rename(spark, old, table)
        throw e
    }
    spark.sql(s"DROP TABLE $old")
    maxB
  }
}
