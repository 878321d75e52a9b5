package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for APPEND-pattern state grids — tables
  * directory-partitioned on (`_b` = batch generation, `_kb` = hash
  * bucket) where each fold dynamic-overwrites only its own `_b`
  * generation ([[IncrementalSpans]]' span grid, [[IncrementalDocFreq]]'s
  * df deltas). The services every such grid needs, kept in ONE place
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
  *    until the in-flight batch is re-delivered;
  *  - [[compactBuckets]]: the INCREMENTAL compaction path — fold only
  *    the `_kb` buckets whose partition count exceeds a threshold,
  *    per-bucket, cost ∝ fragmented buckets. At the 100 TB north star
  *    this is the cadence service; [[compact]]'s whole-grid rewrite
  *    (a corpus-sized job with a table-rename window) stays for full
  *    rebuilds (and, for [[IncrementalSpans]], the `_rep` summary
  *    refresh that rides it).
  *
  * == Negative generations (the per-bucket compaction encoding) ==
  *
  * A partition `(_b = -(g+1), _kb = k)` holds the FOLD of bucket k's
  * rows with effective generation ≤ g ("coverage g"). Effective
  * generation of a row: `_b` if `_b ≥ 0`, else `-_b - 1`. Per bucket,
  * the partition with the MOST ADVANCED coverage (min `_b` among
  * negatives) is live; it SHADOWS every partition it folded — positive
  * generations ≤ its coverage and older compacted partitions. Reads go
  * through [[resolved]], which drops shadowed partitions and re-stamps
  * compacted rows with their coverage, so EVERY intermediate crash
  * state of [[compactBuckets]] (merged partition written, source
  * partitions not yet dropped) reads consistently: the write phase
  * only ever adds a more-advanced shadow, and the drop phase only
  * removes already-shadowed partitions. Fences stay exact because a
  * compacted partition's coverage is ≤ the committed watermark by
  * construction, and serve-path predicates only compare `_b` against
  * committed-batch bounds.
  *
  * Single-writer contract (like any non-transactional table service):
  * pause the ingest stream around [[compact]]/[[compactBuckets]]. */
object AppendGrid {

  private def rename(spark: SparkSession, from: String,
      to: String): Unit = {
    // renaming a directory-partitioned managed table drops partition
    // metadata (the rebucket finding) — repair after every rename
    spark.sql(s"ALTER TABLE $from RENAME TO $to")
    CdcMerge.invalidateProps(to)
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

  /** The grid's (`_b`, `_kb`) partition inventory, parsed from the
    * catalog listing — NO data files are read. */
  private def listPartitions(spark: SparkSession,
      table: String): Seq[(Long, Long)] =
    spark.sql(s"SHOW PARTITIONS $table").collect().toSeq.map { r =>
      val kv = r.getString(0).split("/").map { p =>
        val Array(k, v) = p.split("=", 2)
        k -> v.toLong
      }.toMap
      (kv("_b"), kv("_kb"))
    }

  /** Per-bucket most-advanced compacted partition: `_kb` → min `_b`
    * among that bucket's negative generations (empty map when the grid
    * has never been bucket-compacted — the common case, where
    * [[resolved]] is a zero-overhead passthrough). */
  private def bucketBounds(spark: SparkSession,
      table: String): Map[Long, Long] =
    listPartitions(spark, table).filter(_._1 < 0)
      .groupBy(_._2).map { case (kb, ps) => kb -> ps.map(_._1).min }

  /** Per-bucket compacted COVERAGE (`_kb` → coverage generation):
    * positive rows at `_b` ≤ coverage are shadowed in that bucket, so
    * a writer splicing rows at an old generation ([[graft.streaming
    * .IncrementalKnnGraph.deleteVectors]]'s repair rows) must target
    * the covering compacted partition instead. Empty for
    * never-compacted buckets (coverage −1). */
  def bucketCoverage(spark: SparkSession,
      table: String): Map[Long, Long] =
    bucketBounds(spark, table)
      .map { case (kb, bMin) => kb -> (-bMin - 1L) }

  /** Erasure fence: refuse to tombstone while any generation sits
    * ABOVE the committed watermark `wm`. Such rows belong to an
    * in-flight batch inside its crash window: its redelivery commits
    * at `_b > wm ≥ _db`, so the tombstone would silently not cover
    * them and the erasure would half-take. Same reason [[compact]]
    * fences; every ledger-based `deleteDocs` calls this first. */
  def requireAllCommitted(spark: SparkSession, table: String,
      wm: Long): Unit = {
    val open = listPartitions(spark, table)
      .map { case (b, _) => if (b >= 0) b else -b - 1 }
      .filter(_ > wm).distinct.sorted
    require(open.isEmpty,
      s"$table holds uncommitted generation(s) ${open.mkString(",")}" +
        s" above the watermark $wm — re-deliver the in-flight batch " +
        "before erasing (its replay would land above the tombstones " +
        "and silently escape them)")
  }

  /** The LIVE rows of the grid: per bucket, the most-advanced
    * compacted partition (re-stamped to its coverage generation, so
    * downstream `_b`-vs-fence predicates stay exact) plus the positive
    * generations above that coverage; everything a compacted partition
    * folded is shadowed. All serve paths read through this — against a
    * never-bucket-compacted grid it returns the raw table unchanged.
    *
    * Pruning shape: the bounds map comes from the partition listing
    * (control-plane, ≤ nBuckets entries, no data read); the shadowing
    * predicates reference only partition columns and literals, so
    * shadowed partitions prune out of the scan. */
  def resolved(spark: SparkSession, table: String): DataFrame = {
    val grid = spark.table(table)
    val bounds = bucketBounds(spark, table)
    if (bounds.isEmpty) grid
    else {
      val cols = grid.columns.toSeq
      // coverage per bucket as a literal map: live positive rows sit
      // strictly above their bucket's coverage (never-compacted
      // buckets look up null → -1 keeps everything)
      val covMap = map(bounds.toSeq.flatMap { case (kb, bMin) =>
        Seq(lit(kb), lit(-bMin - 1L))
      }: _*)
      // try_element_at, not element_at: null-on-missing-key is the
      // semantics this lookup NEEDS (never-compacted buckets are
      // absent from the map), and element_at's behavior there has
      // been ANSI-version-sensitive — try_ pins it explicitly
      val pos = grid.filter(col("_b") >= 0 &&
        col("_b") > coalesce(try_element_at(covMap, col("_kb")),
          lit(-1L)))
      val negKeep = bounds.toSeq.map { case (kb, bMin) =>
        col("_kb") === kb && col("_b") === bMin
      }.reduce(_ || _)
      val neg = grid.filter(col("_b") < 0 && negKeep)
        .withColumn("_b", -col("_b") - lit(1L))
        .select(cols.map(col): _*)
      pos.unionByName(neg)
    }
  }

  // ------------------------------------------------------------------
  // Erasure tombstones. The append-grid index family (BM25 postings,
  // containment twins, LSH band rows, spans, media pHash) is keyed by
  // CONTENT keys (word / shingle / band key / span hash) — a document's
  // rows are spread across every bucket its keys hash into, so a
  // doc-keyed physical delete cannot partition-prune and would rewrite
  // the whole grid. Erasure is therefore a TOMBSTONE LEDGER
  // (`{table}_dels`: one row per (key, _db) with _db = the grid's
  // committed watermark at delete time) that serves SUBTRACT and
  // compaction folds PHYSICALLY RECLAIM:
  //
  //  - a tombstone hides rows with `_b <= _db` for its key — strictly
  //    less than any later re-insertion's generation, so deleted-then-
  //    re-ingested documents serve their NEW rows only;
  //  - [[resolvedLive]] is the tombstone-aware read every serve goes
  //    through; the dels side is metadata-sized (one slim row per
  //    erased key per erasure) and broadcast;
  //  - [[compact]]/[[compactBuckets]] with `delKey` set subtract
  //    tombstoned rows BEFORE the fold, so the rewrite physically
  //    reclaims them. The restamp-to-coverage is then exact: a
  //    surviving row either has no tombstone or was re-inserted at
  //    `_b > _db`, and the restamp only raises `_b` — never across a
  //    tombstone boundary it was below (proof: fold only includes
  //    rows the tombstone does NOT hide, i.e. `_b > _db`, and
  //    coverage ≥ that `_b`).
  //  - the ledger itself is KEPT after compaction (it is the
  //    re-insertion fence and, for [[IncrementalBm25]], the corpus-
  //    statistics delta); its rows are a few longs per erased key —
  //    a full grid rebuild is what resets it.
  //
  // Deletion is a single-writer maintenance operation like
  // compaction: pause the ingest stream around it.
  // ------------------------------------------------------------------

  /** The grid's tombstone ledger table name. */
  def delsTable(table: String): String = s"${table}_dels"

  /** Append erasure tombstones for `keys` (a single-column frame
    * matching `keyCol`'s type, plus any family extra columns) at
    * delete-watermark `delWm`. Exact duplicates (same key, same
    * `_db`) are skipped so repeated calls converge; overlapping
    * ranges from delete→re-insert→delete cycles are kept (each
    * subtracts its own insertion's rows). */
  def appendDels(spark: SparkSession, table: String, keys: DataFrame,
      keyCol: String, delWm: Long): Unit = {
    val delsT = delsTable(table)
    val rows = keys.withColumn("_db", lit(delWm)).distinct()
    if (!spark.catalog.tableExists(delsT)) {
      CdcMerge.dropStateTable(spark, delsT)
      rows.coalesce(1).write.format("parquet").saveAsTable(delsT)
    } else {
      spark.catalog.refreshTable(delsT)
      rows.join(spark.table(delsT), Seq(keyCol, "_db"), "left_anti")
        .select(spark.table(delsT).columns.toSeq.map(col): _*)
        .coalesce(1).write.mode("append").insertInto(delsT)
      spark.catalog.refreshTable(delsT)
    }
  }

  /** Monotone DELETE EPOCH for a grid with erasure enabled: the
    * tombstone-ledger row count — grows with every erasure, never
    * shrinks (re-insertion serves above `_db` without retiring ledger
    * rows), and is stable under idempotent re-deletes. Combined with
    * the grid's committed watermark it versions the index for
    * multi-index consumers ([[WaveMark]]) and derived views: a delete
    * mutates the served index without moving the fold watermark. */
  def mutationEpoch(spark: SparkSession, table: String): Long = {
    val delsT = delsTable(table)
    if (!spark.catalog.tableExists(delsT)) 0L
    else {
      spark.catalog.refreshTable(delsT)
      spark.table(delsT).count()
    }
  }

  /** `rows` (must still carry `_b`) minus the tombstoned rows of
    * `table`'s ledger: a row is hidden when its `keyCol` has a
    * tombstone with `_b <= _db`. Pass-through when the grid has never
    * seen a delete. The dels side is broadcast — metadata-sized by
    * the ledger contract. */
  def minusDeleted(spark: SparkSession, table: String,
      rows: DataFrame, keyCol: String): DataFrame = {
    val delsT = delsTable(table)
    if (!spark.catalog.tableExists(delsT)) rows
    else {
      spark.catalog.refreshTable(delsT)
      val d = broadcast(spark.table(delsT)
        .select(col(keyCol).as("_del_key"), col("_db")))
      rows.join(d,
        col(keyCol) === col("_del_key") && col("_b") <= col("_db"),
        "left_anti")
    }
  }

  /** [[resolved]] minus `table`'s tombstones — the serve-path read
    * for grids with erasure enabled. `delsFrom` overrides which
    * grid's ledger applies (a grid PAIR like the containment twins
    * shares ONE ledger, named after the primary). */
  def resolvedLive(spark: SparkSession, table: String,
      keyCol: String, delsFrom: Option[String] = None): DataFrame =
    minusDeleted(spark, delsFrom.getOrElse(table),
      resolved(spark, table), keyCol)

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
    * `wm`: the watermark table fencing this grid — defaults to the
    * grid's own `<table>_wm`; a grid PAIR sharing one watermark (the
    * [[IncrementalContainment]] forward/inverted twins, watermark
    * written once after both generation writes) passes the shared
    * name.
    *
    * Returns the compacted generation id (`maxB`). */
  def compact(spark: SparkSession, table: String,
      fold: (DataFrame, Long) => DataFrame,
      sortCols: Seq[String] = Nil, wm: Option[String] = None,
      delKey: Option[String] = None,
      delsFrom: Option[String] = None): Long = {
    recover(spark, table)
    spark.catalog.refreshTable(table)
    // effective generations: a bucket-compacted partition counts as
    // its coverage, and its shadowed sources don't count at all
    val maxB = listPartitions(spark, table)
      .map { case (b, _) => if (b >= 0) b else -b - 1 }
      .foldLeft(0L)(math.max)
    val wmT = wm.getOrElse(s"${table}_wm")
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
    // tombstone-aware source when erasure is enabled: the rewrite
    // PHYSICALLY RECLAIMS tombstoned rows (the ledger itself is kept —
    // see the tombstone section doc)
    val src = delKey match {
      case Some(k) =>
        minusDeleted(spark, delsFrom.getOrElse(table),
          resolved(spark, table), k)
      case None => resolved(spark, table)
    }
    val folded = fold(src, maxB)
      .repartition(col("_kb"))
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

  /** INCREMENTAL compaction: fold only the buckets whose live
    * partition count (at or below the committed-watermark fence)
    * reaches `minParts`, each into its own negative-generation
    * compacted partition (coverage = the fence — see the object doc's
    * encoding), then drop the partitions it shadowed. Cost ∝
    * fragmented buckets: untouched buckets' files are never rewritten,
    * there is no table rename window, and no whole-table MSCK.
    *
    * Crash-safe without staging: the merged write is a static
    * `INSERT OVERWRITE PARTITION (_b=-(fence+1), _kb=k)` (replaces
    * exactly one partition, idempotent), and from the moment it lands
    * [[resolved]] serves the bucket from it alone — a crash before,
    * between, or mid-way through the shadowed-partition drops leaves
    * only already-shadowed partitions behind, which the next run
    * detects (they count toward `minParts`) and re-drops. Re-running
    * after any crash converges.
    *
    * `fold(liveRows, fence)` builds the bucket's compacted rows from
    * its resolved live rows — same callback contract as [[compact]]
    * (stamp `_b = fence`, keep `_kb`); the `_b` stamp is dropped on
    * write (the partition spec carries the real negative id), so the
    * two paths share each grid's fold unchanged. `dataCols` as in
    * [[writeGeneration]].
    *
    * Returns the bucket ids compacted or cleaned (empty when nothing
    * is fragmented, no drop-phase leftovers exist, or no batch has
    * committed). Single-writer: pause the ingest stream. */
  def compactBuckets(spark: SparkSession, table: String,
      fold: (DataFrame, Long) => DataFrame, dataCols: Seq[String],
      sortCols: Seq[String] = Nil, minParts: Int = 4,
      wm: Option[String] = None, delKey: Option[String] = None,
      delsFrom: Option[String] = None): Seq[Long] = {
    recover(spark, table)
    spark.catalog.refreshTable(table)
    val wmT = wm.getOrElse(s"${table}_wm")
    TableSwap.recover(spark, wmT, s"${wmT}_stage")
    if (!spark.catalog.tableExists(wmT)) return Nil
    val fence = spark.table(wmT)
      .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
    if (fence < 0) return Nil
    val parts = listPartitions(spark, table)
    def eff(b: Long): Long = if (b >= 0) b else -b - 1
    // Target selection. A bucket is FRAGMENTED when ≥ minParts of its
    // partitions sit at or below the fence (shadowed leftovers from a
    // crashed run count: they still need dropping). When the bucket's
    // compacted coverage already reaches the fence (a crashed run's
    // merged write landed), the fold is skipped but the shadowed
    // sources are still dropped — convergence. A bucket is
    // additionally a DROP-ONLY target whenever a compacted partition
    // coexists with partitions it already shadows (a crash during a
    // previous run's drop phase): those leftovers are dead data
    // [[resolved]] skips, and they are reclaimed REGARDLESS of
    // minParts — without this they could persist forever below the
    // fragmentation threshold (the r14 advice). Coverage ABOVE the
    // fence (only reachable under a rewound watermark) skips the
    // bucket whole.
    val info = parts.groupBy(_._2).toSeq.map { case (kb, ps) =>
      val covB = ps.map(_._1).filter(_ < 0).minOption
      val cov = covB.map(b => -b - 1).getOrElse(-1L)
      val frag = ps.count(p => eff(p._1) <= fence) >= minParts
      val leftovers = covB.exists(cb =>
        ps.exists(p => p._1 != cb && eff(p._1) <= cov))
      (kb, ps.map(_._1), covB, cov, frag, leftovers)
    }.sortBy(_._1)
    val targets = info.filter { case (_, _, _, cov, frag, left) =>
      cov <= fence && (frag || left)
    }
    val newB = -(fence + 1L)
    // ONE resolved snapshot for every bucket's live read: the bounds
    // are computed here, and the only partitions phase 1 adds are
    // newB shadows each task filters out of its own bucket anyway.
    // Tombstone-aware when erasure is enabled — the per-bucket
    // rewrite physically reclaims tombstoned rows.
    val snap0 = resolved(spark, table)
    val snap = delKey match {
      case Some(k) =>
        minusDeleted(spark, delsFrom.getOrElse(table), snap0, k)
      case None => snap0
    }
    // PHASE 1: merge + write each fragmented bucket — SERIAL by
    // necessity: concurrent INSERTs into one table share the Hadoop
    // committer's `_temporary` staging under the table path and
    // corrupt each other's attempts (measured — chmod-on-missing-file
    // task failures under an 8-way pool). Per-bucket writes stay the
    // crash-safe unit: each INSERT replaces only ITS partition, whose
    // shadowed sources survive until phase 2.
    // fold only the FRAGMENTED buckets whose coverage hasn't reached
    // the fence (a crashed run's landed merge, cov == fence, skips
    // the fold; drop-only targets never fold)
    val toWrite = targets.filter { case (_, _, _, cov, frag, _) =>
      frag && cov < fence }
    if (toWrite.nonEmpty) {
      // ONE fold computation + checkpoint for every target bucket
      // (the per-bucket loop re-derived the full resolved+fold plan
      // per bucket: nBuckets× the planning, nBuckets× the source
      // scan, nBuckets× the materialization job — measured as the
      // dominant cost of every maintained-index harness at sf0.1).
      // Bucket-safety of the multi-bucket fold is the SAME contract
      // [[compact]] already exercises: every fold callback runs over
      // the whole resolved grid there. The per-bucket static INSERT
      // below stays the crash-safe unit — each replaces exactly ITS
      // partition from the in-memory checkpoint (a trivially-planned
      // filter), and sources survive until phase 2.
      val wKbs = toWrite.map(_._1)
      val live = snap
        .filter(col("_kb").isin(wKbs: _*) && col("_b") <= fence)
      val folded = fold(live, fence)
        .repartition(math.max(wKbs.size, 1), col("_kb"))
      val sorted =
        if (sortCols.isEmpty) folded
        else folded.sortWithinPartitions(
          (col("_kb") +: sortCols.map(col)): _*)
      // localCheckpoint: materialize the merged buckets BEFORE any
      // overwrite touches their source files — also cuts the plan's
      // file lineage, without which Spark rejects an insert that
      // reads the table it overwrites. Hash collisions may co-locate
      // two buckets in one partition; the filter below still reads
      // each bucket's rows contiguous and sorted.
      val merged = CdcMerge.commitCheckpoint(sorted)
      try {
        // ONE dynamic-partition overwrite for every fragmented bucket
        // (was: one static INSERT per bucket — nBuckets serial write
        // jobs of fixed plan/commit overhead each, measured as the
        // compaction's dominant fixed cost in the r16 optimization
        // round). The merged checkpoint holds exactly the
        // (_b = newB, _kb ∈ wKbs) rows, and dynamic overwrite
        // replaces exactly the partitions PRESENT in the data — the
        // crash-safe unit is unchanged: each partition is replaced
        // whole at commit, shadowed sources survive until phase 2,
        // and a crash mid-commit leaves some buckets covered
        // (re-detected as drop-only targets) and the rest fragmented
        // (re-folded) — the same intermediate states the serial loop
        // could leave. A bucket whose fold is EMPTY (every row
        // tombstoned) writes no covering partition; phase 2 still
        // drops its sources, leaving the bucket correctly empty (the
        // serial path wrote an empty covering partition instead —
        // same served rows). The checkpointed frame crosses into the
        // dynamic-overwrite session clone through a global temp view
        // (session-agnostic LogicalRDD leaf — the CdcMerge bridge).
        val bridge = s"${table}_bkt_src"
        merged
          .select((dataCols.map(col) :+ lit(newB).as("_b") :+
            col("_kb")): _*)
          .createOrReplaceGlobalTempView(bridge)
        try CdcMerge.withDynamicOverwrite(spark) { w =>
          w.table(s"global_temp.$bridge")
            .write.mode("overwrite").insertInto(table)
        } finally spark.catalog.dropGlobalTempView(bridge)
      } finally {
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .freeLocalCheckpoint(merged)
        ()
      }
    }
    // PHASE 2 (serial, after every merge landed): drop the shadowed
    // partitions, one DDL for the whole table. A partition is
    // droppable exactly when the bucket's FINAL covering partition
    // shadows it: newB (coverage = fence) for buckets folded this
    // run, else the pre-existing compacted partition (coverage =
    // cov) — drop-only targets must NOT drop live positive
    // generations above their coverage. Every dropped partition is
    // already shadowed — a crash anywhere in (or before) this phase
    // reads exactly through [[resolved]] and the next run converges.
    val written = toWrite.map(_._1).toSet
    val doomed = targets.flatMap { case (kb, bs, covB, cov, _, _) =>
      val (fCov, fCovB) =
        if (written(kb)) (fence, newB) else (cov, covB.getOrElse(newB))
      bs.filter(b => b != fCovB && eff(b) <= fCov).map(b => (b, kb))
    }
    if (doomed.nonEmpty) spark.sql(
      s"ALTER TABLE $table DROP IF EXISTS " + doomed.map {
        case (b, kb) => s"PARTITION (_b='$b', _kb='$kb')"
      }.mkString(", "))
    spark.catalog.refreshTable(table)
    targets.map(_._1)
  }
}
