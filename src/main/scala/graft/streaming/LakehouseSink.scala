package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Lakehouse write path: partitioned + bucketed parquet tables.
  *
  * Why bucketing matters at 100 TB: a table bucketed by its join/agg
  * key reads back with NO Exchange — the join or aggregation reuses
  * the on-disk hash partitioning, so the most expensive shuffle of a
  * downstream pipeline is paid ONCE at write time instead of on every
  * query. `PlanQualitySpec`/`LakehouseSinkSpec` assert the no-Exchange
  * read-back.
  *
  * Layout contract:
  *  - `partitionBy` columns become directory partitions → partition
  *    pruning for predicates on them (date/tenant-style columns);
  *  - `bucketBy` column hash-splits each partition into `buckets`
  *    files → co-located joins/aggs on that key;
  *  - buckets are `sortBy`-ordered on the bucket key, enabling
  *    sort-merge reads without a sort step.
  *
  * Compaction note: streaming appends create one file set per
  * micro-batch; per-bucket file counts grow with batch count, not data
  * size. The remedy is periodic compaction — `compact()` rewrites the
  * table in one batch job (same layout, minimal file count). Run it on
  * a schedule, off the ingest path, like any lakehouse table service.
  */
object LakehouseSink {

  /** Write `df` as a partitioned+bucketed managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, partitionCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    var w = df.write.mode(mode).format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
  }

  /** Repartition so output files land near `targetMB` each, using
    * Catalyst's own size estimate for the plan (columnar stats /
    * scan sizes — no extra pass over the data). The chronic lakehouse
    * failure modes this guards: thousands of KB-sized files from
    * over-parallel writers (NameNode/listing pressure, read-amp), or
    * single multi-GB files that serialize downstream scans. Estimates
    * are coarse (pre-compression logical size), so this targets the
    * right ORDER of file count, which is what matters. */
  def repartitionForTarget(df: DataFrame, targetMB: Int = 256): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / (targetMB.toLong * 1024 * 1024)).toLong
      .max(1L).min(100000L).toInt
    df.repartition(parts)
  }

  /** Rewrite the table with the same layout, minimal files.
    *
    * The swap is a staged rename chain — table→_old, tmp→table,
    * drop _old — so the data is recoverable at EVERY step: a crash
    * leaves the rows under `table`, `_old`, or `_compacting`, never
    * lost between a DROP and a RENAME. If the forward rename fails the
    * original name is restored in the catch. Re-runnability: before
    * clearing leftovers of a crashed run, the half-swapped state (a
    * crash BETWEEN the two renames leaves `table` absent and the data
    * only under `_old`/`_compacting`) is detected and the table name
    * restored first — a blind up-front DROP there would destroy the
    * only surviving copies. (The name is still unresolvable for the
    * instant between the two renames — single-writer assumed, like any
    * non-transactional lakehouse table service.)
    */
  def compact(spark: SparkSession, table: String, bucketCol: String,
      buckets: Int, partitionCols: Seq[String] = Nil): Unit =
    stagedRewrite(spark, table, s"${table}_compacting") { tmp =>
      writeBucketed(spark.table(table), tmp, bucketCol, buckets,
        partitionCols)
    }

  /** Range-cluster the table on `clusterCols` — the data-layout
    * service for SCAN pruning, complementing `compact`'s file-count
    * hygiene. `repartitionByRange` + `sortWithinPartitions` gives each
    * output file a narrow, pairwise-disjoint range of the cluster
    * column(s) (lexicographic for multi-column — effective for
    * prefix predicates; a space-filling-curve interleave would trade
    * per-column locality for multi-column balance). Parquet then
    * stores tight per-file/row-group min-max stats, so a range or
    * point predicate on the cluster column skips all but the matching
    * row groups at read time — the same reason the ReplaySource can
    * prune replay scans by event_id. Same staged-rename crash contract
    * as `compact`; single-writer, run off the ingest path.
    *
    * `nFiles` sizes the rewrite (use `repartitionForTarget`'s estimate
    * arithmetic for a byte-targeted count at scale). */
  def clusterBy(spark: SparkSession, table: String,
      clusterCols: Seq[String], nFiles: Int): Unit =
    stagedRewrite(spark, table, s"${table}_clustering") { tmp =>
      requirePlainLayout(spark, table, "clusterBy")
      spark.table(table)
        .repartitionByRange(nFiles, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
        .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    }

  /** Z-order (Morton-curve) clustering on TWO numeric columns — the
    * multi-dimensional complement to [[clusterBy]]: lexicographic
    * range-clustering gives the second column no locality at all
    * (every file spans its full range — prefix predicates only),
    * while bit-interleaving the two rank-quantized columns gives each
    * file a tight min-max envelope on BOTH, so single-column
    * predicates on EITHER column prune row groups. The trade is
    * per-column sharpness: a z-range covers ~√(files) stripes per
    * dimension, so first-column-only pruning is weaker than
    * clusterBy's — which is exactly why both services exist.
    *
    * Columns are min-max-quantized to `bits` each via one 1-row stats
    * aggregate (broadcast — no second scan, no global window); the
    * interleave is a pure codegen bit expression; the rewrite is
    * `repartitionByRange` on the z-value. Same staged-rename crash
    * contract and plain-layout guard as `clusterBy`; single-writer,
    * off the ingest path. */
  def zorderBy(spark: SparkSession, table: String, colA: String,
      colB: String, nFiles: Int, bits: Int = 16): Unit =
    stagedRewrite(spark, table, s"${table}_zordering") { tmp =>
      requirePlainLayout(spark, table, "zorderBy")
      val df = spark.table(table)
      val maxQ = (1L << bits) - 1
      val stats = df.agg(
        min(col(colA)).cast("double").as("_alo"),
        max(col(colA)).cast("double").as("_ahi"),
        min(col(colB)).cast("double").as("_blo"),
        max(col(colB)).cast("double").as("_bhi"))
      def quant(c: String, lo: Column, hi: Column): Column =
        when(hi <= lo, lit(0L)).otherwise(
          least(greatest(
            floor((col(c).cast("double") - lo) * maxQ / (hi - lo)),
            lit(0.0)), lit(maxQ.toDouble)).cast("long"))
      df.crossJoin(broadcast(stats))
        .withColumn("_qa", quant(colA, col("_alo"), col("_ahi")))
        .withColumn("_qb", quant(colB, col("_blo"), col("_bhi")))
        .withColumn("_z", mortonInterleave(bits))
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_alo", "_ahi", "_blo", "_bhi", "_qa", "_qb", "_z")
        .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    }

  /** Bit-interleave of the `_qa`/`_qb` quantized cells into one Morton
    * z-value (a pure codegen bit expression — shared by both z-order
    * quantizers). */
  private def mortonInterleave(bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftright(col("_qa"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftright(col("_qb"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** [[zorderBy]] with RANK-quantized cells: each column's grid lines
    * are its approximate quantiles (one `percentile_approx` sketch
    * pass — partial-aggregated, no global sort) instead of a uniform
    * min-max split. Min-max quantization is skew-sensitive in exactly
    * the way production id/amount columns punish: one outlier (or a
    * heavy-tailed distribution) stretches the range so the bulk of the
    * rows collapse into a handful of cells, and the curve degenerates
    * to ordering by the OTHER column — no pruning on the skewed one.
    * Quantile grid lines put ~1/2^bits of the ROWS in every cell by
    * construction, so file envelopes stay tight on both columns under
    * any distribution, at the cost of the sketch pass.
    *
    * Per-row quantization is `size(filter(cuts, c -> v >= c))` — a
    * codegen'd linear scan of the 2^bits−1 broadcast cut points, so
    * keep `bits` moderate (default 8 → 255 compares/row; 256×256 z
    * cells is plenty for file-level pruning at any realistic
    * `nFiles`). Duplicate cut points from heavy values just merge
    * cells — rows of one hot value always share a cell, as they must.
    * Same staged-rename crash contract and plain-layout guard. */
  def zorderByRank(spark: SparkSession, table: String, colA: String,
      colB: String, nFiles: Int, bits: Int = 8,
      accuracy: Int = 10000): Unit =
    stagedRewrite(spark, table, s"${table}_zordering") { tmp =>
      requirePlainLayout(spark, table, "zorderByRank")
      val df = spark.table(table)
      val nCells = 1 << bits
      val cuts = (1 until nCells).map(_.toDouble / nCells)
      val stats = df.agg(
        percentile_approx(col(colA).cast("double"), typedLit(cuts),
          lit(accuracy)).as("_ca"),
        percentile_approx(col(colB).cast("double"), typedLit(cuts),
          lit(accuracy)).as("_cb"))
      def quant(c: String, cutsCol: Column): Column =
        size(filter(cutsCol, cut => col(c).cast("double") >= cut))
          .cast("long")
      df.crossJoin(broadcast(stats))
        .withColumn("_qa", quant(colA, col("_ca")))
        .withColumn("_qb", quant(colB, col("_cb")))
        .withColumn("_z", mortonInterleave(bits))
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_ca", "_cb", "_qa", "_qb", "_z")
        .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    }

  /** Plain-layout guard shared by the re-layout services: their
    * rewrites emit unpartitioned, unbucketed parquet, which would
    * silently DESTROY a directory partitioning (turning CdcMerge's
    * dynamic partition overwrite into a whole-table overwrite) or a
    * bucketBy layout (breaking the no-Exchange read-back contract).
    * Partitioned state tables re-layout via rebucket; bucketed tables
    * via compact. Called after the skeleton's crash recovery (the
    * table is guaranteed to exist) and before any rename (a throw
    * leaves the table untouched). */
  private def requirePlainLayout(spark: SparkSession, table: String,
      service: String): Unit = {
    val special = spark.catalog.listColumns(table).collect()
      .filter(c => c.isPartition || c.isBucket)
    require(special.isEmpty,
      s"$service($table): table has partition/bucket columns " +
        s"${special.map(_.name).mkString(", ")} — a re-layout " +
        "rewrite would discard that layout; use compact (bucketed) " +
        "or rebucket (partitioned state) instead")
  }

  /** The stage-table suffixes every rewrite service may leave behind
    * on a crash — recovery and cleanup consider ALL of them, because
    * a clusterBy may be the first service to run after a crashed
    * compact (and vice versa). */
  private val stageSuffixes = Seq("_compacting", "_clustering", "_zordering")

  /** The staged-rename rewrite skeleton shared by the table services:
    * recover a half-swapped crash state, clear stage leftovers (from
    * ANY service, not just the calling one), write the stage via
    * `writeStage`, then swap table→_old, tmp→table, drop _old —
    * recoverable at every step (see `compact`'s note). */
  private[streaming] def stagedRewrite(spark: SparkSession,
      table: String, tmp: String)(writeStage: String => Unit): Unit = {
    val old = s"${table}_old"
    val allStages = stageSuffixes.map(table + _) :+ tmp
    if (!spark.catalog.tableExists(table)) {
      // half-swapped crash state: restore the name before any DROP.
      // Prefer _old (the pre-rewrite original); any surviving stage
      // holds the same rows post-rewrite if _old is somehow gone too
      // — including the OTHER service's stage from an earlier crash.
      val stage = allStages.find(spark.catalog.tableExists)
      if (spark.catalog.tableExists(old)) {
        spark.sql(s"ALTER TABLE $old RENAME TO $table")
        CdcMerge.invalidateProps(table)
      } else if (stage.isDefined) {
        spark.sql(s"ALTER TABLE ${stage.get} RENAME TO $table")
        CdcMerge.invalidateProps(table)
      } else throw new IllegalStateException(
        s"rewrite($table): table does not exist and no crash leftovers " +
          s"($old / ${allStages.mkString(" / ")}) to recover from")
    }
    // dropStateTable, not bare DROP: a crash mid-saveAsTable can leave
    // a stage DIRECTORY with no catalog entry, which a plain DROP
    // ignores and the next write trips over (LOCATION_ALREADY_EXISTS).
    // Clear every service's stage name — a crashed compact must not
    // leave an orphan copy behind a later clusterBy, and vice versa.
    allStages.distinct.foreach(CdcMerge.dropStateTable(spark, _))
    CdcMerge.dropStateTable(spark, old)
    writeStage(tmp)
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    try spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    catch {
      case e: Throwable =>
        spark.sql(s"ALTER TABLE $old RENAME TO $table")
        throw e
    }
    spark.sql(s"DROP TABLE $old")
    CdcMerge.invalidateProps(table)
  }

  /** Streaming ingestion into the bucketed table via foreachBatch.
    *
    * Semantics: foreachBatch + append is AT-LEAST-once (a crash between
    * table append and offset commit replays the batch); each row
    * carries its `_batch_id` so downstream consumers can drop replayed
    * batches idempotently — the same claim the queue sink makes, and
    * the honest one without a transactional table format underneath.
    */
  /** Exactly-once consumer view over the at-least-once append table:
    * one row per natural key, survivor = the FIRST delivery (lowest
    * `_batch_id`, then arbitrary-but-deterministic within a replayed
    * batch — replayed rows are byte-identical, so any survivor is the
    * same row). A crash between table append and offset commit replays
    * the whole batch (`startBucketedStream`'s documented contract, the
    * reference's own at-least-once semantics at
    * `stream_cdc/processing/coordinator.py:291-298`); this is the
    * idempotent-read half that turns it into effectively-exactly-once.
    * One row_number window partitioned by key — a single keyed shuffle,
    * no global ordering. */
  def dedupReplayedBatches(df: DataFrame, keyCols: Seq[String],
      batchIdCol: String = "_batch_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(batchIdCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  def startBucketedStream(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, partitionCols: Seq[String], checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBucketed(batch.withColumn("_batch_id", lit(batchId)),
          table, bucketCol, buckets, partitionCols, mode = "append")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
