package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained equi-JOIN view over two [[CdcMerge]] state
  * tables — the derived-view family's join member ([[IncrementalAgg]]
  * maintains aggregates, [[IncrementalStats]] extrema/moments, this
  * maintains `leftState ⋈ rightState` on a shared key). The view a
  * feature store serves ("user's latest purchase joined to their
  * latest click") without re-joining two full tables per batch.
  *
  * Per batch: merge each side's change batch into its state table
  * (idempotent, [[CdcMerge.applyBatch]]), then recompute the view rows
  * of DIRTY KEYS ONLY — keys present in either batch: `fresh` is the
  * two post-merge states restricted to the dirty set (broadcast
  * semi-joins; the dirty set is batch-sized) joined on the key, and
  * only the view partitions those keys hash into are rewritten, each
  * rebuilt as (its rows for non-dirty keys) ∪ fresh. Cost ∝ batch +
  * touched partitions — never either table's size, the property that
  * keeps a 100 TB view maintainable from a trickle of changes.
  *
  * Correctness contracts (spec-pinned):
  *  - **Equivalence**: after any batch sequence, the view equals the
  *    one-shot `readState(left) ⋈ readState(right)` (cdc26 pins this
  *    against the DuckDB oracle).
  *  - **Idempotent replay**: state merges are idempotent and the view
  *    rewrite is a pure function of the two post-merge states and the
  *    batch's key set — a redelivered batch rewrites identical
  *    partitions.
  *  - **Unmatch removal**: a dirty key whose join no longer matches
  *    (one side tombstoned, or never present) contributes no fresh
  *    rows, and the partition overwrite removes its stale view rows
  *    wholesale; a partition drained to zero rows is dropped outright
  *    (dynamic overwrite cannot write an empty partition — the
  *    [[Scd2Merge.vacuumClosed]] rule).
  *
  * Left and right value columns must be disjoint apart from `keyCol`
  * (pre-project each side — the cdc26 query renames per side). */
object IncrementalJoin {

  /** Merge the change batches (either may be absent) and maintain
    * `viewTable`. Each side's `opCol` marks tombstones per
    * [[CdcMerge.readState]]'s contract. */
  def applyBatch(spark: SparkSession, leftTable: String,
      rightTable: String, viewTable: String,
      leftBatch: Option[DataFrame], rightBatch: Option[DataFrame],
      keyCol: String, leftVersionCols: Seq[String],
      rightVersionCols: Seq[String], nBuckets: Int = 8,
      leftOpCol: String = "event_type", rightOpCol: String = "event_type",
      deleteOp: String = "Delete"): Unit = FoldTimer.timed {
    // merges HAND BACK their committed checkpointed frames (the
    // post-merge touched buckets): the view recompute below reads the
    // post-merge state of exactly those buckets, and re-reading the
    // table paid a second listing + scan + plan per side per fold
    // (the r17 probe's top remaining cdc26/27 cost)
    val lKeep = leftBatch.flatMap(b => CdcMerge.applyBatchKeyedRetained(
      spark, leftTable, b, Seq(keyCol), leftVersionCols, nBuckets))
    val rKeep = rightBatch.flatMap(b => CdcMerge.applyBatchKeyedRetained(
      spark, rightTable, b, Seq(keyCol), rightVersionCols, nBuckets))
    try {
      val dirty = (leftBatch.toSeq ++ rightBatch.toSeq)
        .map(_.select(col(keyCol)))
        .reduceOption(_ unionByName _)
        .map(_.distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .getOrElse(return)
      try {
        // touched view partitions: driver-side but bounded by nBuckets;
        // derived from the DIRTY KEYS, not from fresh rows, so a key
        // whose join vanished still gets its partition rewritten
        val touched = dirty
          .select(pmod(xxhash64(col(keyCol)), lit(nBuckets)).as("_kb"))
          .distinct().collect().map(_.getLong(0))
        if (touched.isEmpty) return

        val l = stateSide(spark, leftTable, touched, lKeep, leftOpCol,
            deleteOp, nBuckets)
          .join(broadcast(dirty), Seq(keyCol), "left_semi")
        val r = stateSide(spark, rightTable, touched, rKeep, rightOpCol,
            deleteOp, nBuckets)
          .join(broadcast(dirty), Seq(keyCol), "left_semi")
        val fresh = l.join(r, Seq(keyCol))
          .withColumn("_kb", pmod(xxhash64(col(keyCol)), lit(nBuckets)))
        rewriteView(spark, viewTable, keyCol, dirty, touched, fresh)
      } finally dirty.unpersist()
    } finally freeKeeps(lKeep, rKeep)
  }

  /** Post-merge state of the `touched` buckets, tombstones filtered:
    * served from the merge's retained checkpoint where it covers the
    * bucket, from the table only for buckets the merge never touched
    * (dirty keys arriving on the OTHER side only). Falls back to the
    * plain pruned table read when no frame was retained (create path,
    * absent batch). */
  private[streaming] def stateSide(spark: SparkSession, table: String,
      touched: Array[Long], keep: Option[(DataFrame, Array[Long])],
      opCol: String, deleteOp: String, nBuckets: Int): DataFrame =
    keep match {
      case Some((merged, mTouched)) =>
        val fromMerge = merged
          .filter(col(opCol) =!= deleteOp).drop("_kb")
        val extra = touched.filterNot(mTouched.toSet)
        if (extra.isEmpty) fromMerge
        else fromMerge.unionByName(CdcMerge.readStateBuckets(spark,
          table, extra.toSeq, opCol, deleteOp, nBuckets = nBuckets))
      case None =>
        CdcMerge.readStateBuckets(spark, table, touched.toSeq, opCol,
          deleteOp, nBuckets = nBuckets)
    }

  private[streaming] def freeKeeps(
      keeps: Option[(DataFrame, Array[Long])]*): Unit =
    keeps.flatten.foreach { case (df, _) =>
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .freeLocalCheckpoint(df)
      ()
    }

  /** Dirty-key partition rewrite shared by the incremental view
    * family ([[IncrementalJoin]], [[IncrementalNearestJoin]]): replace
    * the view rows of `dirty` keys with `fresh` (which must already
    * carry the `_kb` bucket column), touching only the partitions in
    * `touched`. A touched partition drained to zero rows is dropped
    * outright (dynamic overwrite cannot write an empty partition —
    * the [[Scd2Merge.vacuumClosed]] rule). */
  private[streaming] def rewriteView(spark: SparkSession,
      viewTable: String, keyCol: String, dirty: DataFrame,
      touched: Array[Long], fresh: DataFrame): Unit = {
    // legacy-stage hygiene (once per session per view): the retired
    // staged-table path could leave `${viewTable}_stage` behind on a
    // pre-upgrade crash — an orphan that shadows any future operator
    // using the same stage name (the Scd2Merge.applyBatch rule)
    if (legacyStageCleared.add((spark, viewTable)))
      CdcMerge.dropStateTable(spark, s"${viewTable}_stage")
    if (!spark.catalog.tableExists(viewTable)) {
      // clear a partial warehouse dir a crashed first write left
      CdcMerge.dropStateTable(spark, viewTable)
      fresh.repartition(col("_kb"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_kb").saveAsTable(viewTable)
      return
    }
    spark.catalog.refreshTable(viewTable)
    val cols = spark.table(viewTable).columns
    val keep = spark.table(viewTable)
      .filter(col("_kb").isin(touched.toSeq: _*))
      .join(broadcast(dirty), Seq(keyCol), "left_anti")
    val merged = keep.unionByName(fresh.select(cols.toSeq.map(col): _*))
    // materialize the rewritten partitions ONCE (localCheckpoint),
    // then dynamic-overwrite them in place — the CdcMerge
    // .applyBatchKeyed commit shape: the checkpoint cuts the
    // self-read lineage (the insert targets the table `keep` reads)
    // and retires the staged-table round-trip this path carried (a
    // full extra table write + create + re-read + DROP per fold,
    // measured across cdc26/cdc27 in the r16 optimization round).
    // Crash contract unchanged: the insert replaces touched
    // partitions at job commit; a crash before that leaves the view
    // untouched and the replayed batch rewrites identical partitions.
    val merged2 =
      CdcMerge.commitCheckpoint(merged.repartition(col("_kb")))
    try {
      val stagedKbs = merged2.select("_kb").distinct()
        .collect().map(_.getLong(0)).toSet
      val bridge = s"${viewTable}_view_src"
      merged2.createOrReplaceGlobalTempView(bridge)
      try CdcMerge.withDynamicOverwrite(spark) { w =>
        w.table(s"global_temp.$bridge").select(cols.toSeq.map(col): _*)
          .write.mode("overwrite").insertInto(viewTable)
      } finally spark.catalog.dropGlobalTempView(bridge)
      // a touched partition with NO surviving rows is absent from the
      // rewrite — dynamic overwrite left its stale files; drop them
      // (one DDL for all of them)
      val drained = touched.filterNot(stagedKbs)
      if (drained.nonEmpty) spark.sql(
        s"ALTER TABLE $viewTable DROP IF EXISTS " +
          drained.map(kb => s"PARTITION (_kb=$kb)").mkString(", "))
    } finally {
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .freeLocalCheckpoint(merged2)
      ()
    }
    spark.catalog.refreshTable(viewTable)
  }

  // (session, viewTable) pairs whose legacy stage was already cleared
  // this session — keeps the hygiene to one catalog op per view
  private val legacyStageCleared = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      java.lang.Boolean]())

  /** The maintained view, without the bucketing column. */
  def readView(spark: SparkSession, viewTable: String): DataFrame = {
    spark.catalog.refreshTable(viewTable)
    spark.table(viewTable).drop("_kb")
  }
}
