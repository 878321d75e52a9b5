package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incrementally-maintained REPEATED-SPAN statistics — doc46's
  * exact-substring report (Lee et al. arXiv:2107.06499) kept current
  * under document ingest. The state is the (span_key, doc_id) → n_occ
  * GRID — the minimal sufficient statistic for the span-level report
  * (n_docs = grid rows per key, n_occ = their sum). HONESTY: the grid
  * drops positions and folds per-doc multiplicity, but its
  * cardinality is distinct (span_key, doc_id) ≈ one row per distinct
  * corpus token window for non-repetitive text — CORPUS-SIZED, not
  * small. The span-level report is recomputed grid-sized on read; the
  * position-level deletion list stays the one-shot
  * [[DedupOps.repeatedSpans]]'s job.
  *
  * Storage — the APPEND pattern, not the merge pattern (the
  * [[CdcMerge.applyBatchKeyed]] key-shape doctrine): span keys are
  * md5 hashes, UNIFORMLY distributed, so any batch with ≳nBuckets
  * distinct spans (one ~40-token document already has ~33) would
  * touch EVERY bucket of a hash-bucketed merge table — each fold
  * would rewrite ~the whole corpus-sized grid (the round-12 finding).
  * But grid rows are IMMUTABLE under the ingest contract below, so
  * nothing ever needs superseding: the fold APPENDS the batch's rows
  * as new files, per-fold write ∝ batch, never ∝ grid. Layout: a
  * managed parquet table directory-partitioned on
  * (_b = batch id, _kb = pmod(xxhash64(span_key), nBuckets)) —
  *
  *  - each fold dynamic-partition-overwrites ONLY its own `_b=<id>`
  *    generation (∝ batch), which makes the write IDEMPOTENT through
  *    the crash window: a replay after a crash between the grid write
  *    and the watermark write re-overwrites the same generation with
  *    identical rows;
  *  - a 1-row [[TableSwap]] batch watermark (bounded state)
  *    short-circuits clean replays before any job runs, and is what
  *    makes [[compact]] safe — a batch folded into the compacted
  *    generation can never be re-applied under a fresh `_b`;
  *  - `_kb` keeps rows hash-clustered for keyed consumers and gives
  *    [[compact]] its output partitioning; `nBuckets` is fixed for
  *    the table's lifetime (recorded in table metadata, folds fail
  *    fast on mismatch — [[CdcMerge.requireNBuckets]]);
  *  - per-bucket file count grows one file per fold — run [[compact]]
  *    on cadence (the [[IncrementalDedup]] band-index discipline) to
  *    fold generations back to one file per bucket.
  *
  * Contract: DOCUMENT-DISJOINT append-only batches with
  * MONOTONICALLY-INCREASING batch ids (the foreachBatch shape — each
  * doc arrives once, whole). Under it a (span_key, doc_id) row's
  * n_occ is fixed by the doc's own text and no two batches ever write
  * the same row, so appends keep the grid's primary key exact. A doc
  * re-arriving with CHANGED text is out of contract — but post-hoc
  * ERASURE is supported: [[deleteDocs]] tombstones a doc's rows (and
  * repairs the `_rep` summary), so a changed document is handled as
  * delete + re-ingest under a fresh batch id; workloads where every
  * row mutates belong in the [[CdcMerge]] merge family instead.
  * `spanLen` is likewise fixed for
  * the table's lifetime (a drifted spanLen would write or probe a
  * disjoint md5 keyspace with no error anywhere): it is recorded in
  * table metadata and every fold/read fails fast on mismatch. */
object IncrementalSpans {

  private def wmTable(gridTable: String) = s"${gridTable}_wm"

  private def repTable(gridTable: String) = s"${gridTable}_rep"

  private val SpanLenProp = "graft.spanlen"

  /** Table property on the `_rep` summary recording which compacted
    * generation it covers. Membership in the summary is MONOTONE-
    * SOUND under ingest (owners only grow, so a key repeated at any
    * point stays repeated) — ERASURE is the one operation that can
    * revoke it, and [[deleteDocs]] repairs the summary in the same
    * call (recount the deleted docs' own keys, evict those below 2
    * live owners). The generation bound is what makes the summary
    * COMPLETE for generations `_b <=` it — newer generations are
    * reconciled at read time. A crash between the summary swap and
    * this property write just leaves the property stale, which
    * degrades the serve back toward the full residual count — never
    * to a wrong answer. */
  private val RepGenProp = "graft.repgen"

  private def requireSpanLen(spark: SparkSession, gridTable: String,
      spanLen: Int): Unit =
    CdcMerge.tableProp(spark, gridTable, SpanLenProp).foreach { s =>
      require(s.toInt == spanLen,
        s"$gridTable was built with spanLen=$s but the caller " +
          s"passed spanLen=$spanLen; spanLen is fixed for the " +
          "table's lifetime (its md5 window keys are " +
          "length-specific) — rebuild the grid to change it")
    }

  /** All tables the span grid maintains — for test/registration
    * cleanup. */
  def tables(gridTable: String): Seq[String] =
    Seq(gridTable, s"${gridTable}_compacting", s"${gridTable}_old",
      AppendGrid.delsTable(gridTable),
      wmTable(gridTable), s"${wmTable(gridTable)}_stage",
      s"${wmTable(gridTable)}_old",
      repTable(gridTable), s"${repTable(gridTable)}_stage",
      s"${repTable(gridTable)}_old")

  /** The highest COMMITTED batch id (-1 before the first watermark
    * write). Every serve path filters the grid to `_b <=` this value:
    * between a fold's grid write and its watermark write (the crash
    * window) the in-flight generation exists on disk but is not yet
    * committed, and serving it would expose a batch that a crash may
    * still replay — snapshot-consistent reads see exactly the
    * pre-batch state until the watermark lands. */
  private def committedBatch(spark: SparkSession,
      gridTable: String): Long = {
    val wm = wmTable(gridTable)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (!spark.catalog.tableExists(wm)) -1L
    else spark.table(wm).agg(coalesce(max("_batch"), lit(-1L)))
      .collect()(0).getLong(0)
  }

  /** Fold one document batch into the span grid: one occurrence
    * aggregation (∝ batch tokens) + one append-shaped write into the
    * batch's own `_b` generation (∝ batch). `nBuckets` must be stable
    * for the table's lifetime. */
  def applyBatch(spark: SparkSession, gridTable: String,
      batchDocs: DataFrame, batchId: Long, spanLen: Int = 8,
      nBuckets: Int = 32): Unit = FoldTimer.timed {
    AppendGrid.recover(spark, gridTable)
    if (batchId <= committedBatch(spark, gridTable)) return
    val deltas = DedupOps.spanOccurrences(batchDocs, spanLen)
      .groupBy("span_key", "doc_id")
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("_b", lit(batchId))
      .withColumn("_kb",
        pmod(xxhash64(col("span_key")), lit(nBuckets.toLong)))
      .select(col("span_key"), col("doc_id"), col("n_occ"),
        col("_b"), col("_kb"))
    if (!spark.catalog.tableExists(gridTable)) {
      // clear a stale directory a crashed earlier create left behind
      // (no catalog entry, but the location blocks saveAsTable)
      CdcMerge.dropStateTable(spark, gridTable)
      deltas.repartition(col("_kb"))
        .write.mode("overwrite").format("parquet")
        .partitionBy("_b", "_kb").saveAsTable(gridTable)
      CdcMerge.setNBuckets(spark, gridTable, nBuckets)
      CdcMerge.setTableProp(spark, gridTable, SpanLenProp,
        spanLen.toString)
    } else {
      CdcMerge.requireNBuckets(spark, gridTable, nBuckets)
      requireSpanLen(spark, gridTable, spanLen)
      // static-prefix overwrite of the batch's OWN generation only
      // (AppendGrid.writeGeneration): a fresh batch creates new
      // partitions (pure append); a crash-window replay replaces its
      // whole generation subtree with identical rows (idempotent).
      AppendGrid.writeGeneration(spark, gridTable, deltas, batchId,
        Seq("span_key", "doc_id", "n_occ"))
    }
    import spark.implicits._
    // monotone 1-row-per-fold watermark: append-commit (readers take
    // max(_batch)) — see TableSwap.appendCommit
    TableSwap.appendCommit(spark, Seq(batchId).toDF("_batch"),
      wmTable(gridTable))
  }

  /** ERASURE — remove `docs`' span rows from the served grid (the
    * [[AppendGrid]] tombstone ledger) and REPAIR the `_rep` summary:
    * summary membership was monotone-sound only while the grid had no
    * delete path — a span repeated solely because of a deleted owner
    * must leave the summary, or [[removalView]] would keep cutting it
    * (over-cutting relative to the one-shot on corpus-minus-deleted).
    * `docs` must carry (doc_id, text) with the INGESTED text: the
    * grid is span-keyed, so the docs' own span keys are what bounds
    * the owner recount to ∝ the deleted docs' spans' buckets instead
    * of a corpus scan.
    *
    * Summary repair soundness: only keys OF the deleted docs can lose
    * owners, and the summary covers generations `_b <= repgen` — so
    * recounting exactly those keys' LIVE owners within the covered
    * range, and evicting the ones now below 2, restores the serve
    * rule (`member ∨ residual ≥ 2 ∨ (residual = 1 ∧ compacted = 1)`)
    * for every key. Order: tombstones land FIRST, then the summary
    * swap — a crash in between leaves the summary overstating
    * (removalView may over-cut until the delete is RE-RUN, the
    * convergence contract shared with compaction); re-running is
    * idempotent. Compaction physically reclaims tombstoned rows; a
    * doc re-ingested later serves its new generations. Single-writer:
    * pause the ingest stream. */
  def deleteDocs(spark: SparkSession, gridTable: String,
      docs: DataFrame, spanLen: Int = 8): Unit = {
    AppendGrid.recover(spark, gridTable)
    spark.catalog.refreshTable(gridTable)
    requireSpanLen(spark, gridTable, spanLen)
    val wmB = committedBatch(spark, gridTable)
    if (wmB < 0) return
    // erasure fence: an in-flight fold's redelivery would land above
    // the tombstones and escape them
    AppendGrid.requireAllCommitted(spark, gridTable, wmB)
    AppendGrid.appendDels(spark, gridTable,
      docs.select("doc_id").distinct(), "doc_id", wmB)
    val repT = repTable(gridTable)
    if (!spark.catalog.tableExists(repT)) return
    val g = CdcMerge.tableProp(spark, repT, RepGenProp)
      .map(_.toLong).getOrElse(return)
    spark.catalog.refreshTable(repT)
    // the deleted docs' span keys — batch-sized by construction
    val affected = graft.operators.DedupOps
      .spanOccurrences(docs, spanLen)
      .select("span_key").distinct().localCheckpoint()
    val nBuckets = CdcMerge.tableNBuckets(spark, gridTable)
      .getOrElse(32)
    val kbs = affected
      .select(pmod(xxhash64(col("span_key")), lit(nBuckets.toLong)))
      .distinct().collect().map(_.getLong(0)).toSeq
    // live owner recount WITHIN the summary's covered range, pruned
    // to the affected keys' buckets
    val keep = AppendGrid.resolvedLive(spark, gridTable, "doc_id")
      .filter(col("_b") <= g && col("_kb").isin(kbs: _*))
      .join(broadcast(affected), Seq("span_key"), "left_semi")
      .groupBy("span_key").agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select("span_key")
    val evict = affected.join(keep, Seq("span_key"), "left_anti")
    val rep = spark.table(repT).select("span_key")
    val newRep = rep.join(broadcast(evict), Seq("span_key"),
      "left_anti")
    TableSwap.writeStagedSpread(spark, newRep, repT, col("span_key"))
    // the covered generation is unchanged — re-pin it (writeStaged
    // swaps tables, which drops the property)
    CdcMerge.setTableProp(spark, repT, RepGenProp, g.toString)
  }

  /** The doc46-shaped span-level report served from the maintained
    * grid: spans occurring in ≥ 2 distinct documents, with doc and
    * occurrence counts — one map-side-combined aggregate over the
    * grid (n_docs = rows per key, since (span_key, doc_id) is the
    * grid's primary key — exact because distinct batches are
    * document-disjoint and a replayed batch overwrites its own
    * generation instead of appending twice). */
  def spanReport(spark: SparkSession, gridTable: String): DataFrame = {
    AppendGrid.recover(spark, gridTable)
    spark.catalog.refreshTable(gridTable)
    // snapshot-consistent: an open crash window's generation (grid
    // written, watermark not) is invisible until its batch commits;
    // resolved() additionally shadows bucket-compacted sources
    AppendGrid.resolvedLive(spark, gridTable, "doc_id")
      .filter(col("_b") <= committedBatch(spark, gridTable))
      .groupBy("span_key")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_occ")).as("n_occ"))
      .filter(col("n_docs") >= 2)
  }

  /** MAINTAINED SPAN-DEDUP VIEW — [[DedupOps.removeRepeatedSpans]]
    * served from the maintained grid: rewrite the REQUESTED `docs`
    * with every span the grid knows to be repeated (≥ 2 distinct
    * owner docs ANYWHERE in the ingested corpus) cut out. This is
    * what a per-batch one-shot cannot do: a document ingested early,
    * whose boilerplate only became repeated when a later batch
    * arrived, is cut correctly here because the grid remembers every
    * owner. Requesting the full corpus reproduces
    * [[DedupOps.removeRepeatedSpans]] over it exactly (cdc41 pins
    * that equality through the doc50 oracle).
    *
    * Cost shape — the serve reads a ∝-REPEATED-MASS summary, not the
    * corpus-sized grid (the r13 watch): [[compact]] maintains a
    * `_rep` table of the span keys repeated as of the compacted
    * generation (repeated mass only — a tiny subset of the grid for
    * non-repetitive text), so a read scans
    *
    *  - the summary (∝ repeated mass), semi-joined to the requested
    *    keys (broadcast at shard-sized requests),
    *  - the POST-compaction residual generations (`_b >` the
    *    summary's generation — partition-pruned, ∝ recent batches),
    *  - and, ONLY for requested keys with exactly one residual owner
    *    that the summary doesn't already know (the late-second-owner
    *    case: first owner compacted as a singleton, second owner
    *    arrived after), a point-probe of the compacted generation —
    *    partition-pruned to the probe keys' `_kb` buckets and pushed
    *    down as an `IN` filter over the bucket-sorted span_key column
    *    (row-group skipping), with a `probeCap` fallback to a
    *    broadcast semi-join scan for degenerate probe sets (measured
    *    cheaper than a whole-grid owner count, which would shuffle
    *    every requested key). An empty probe set (the common serve:
    *    requested docs ingested before the last compaction, residual
    *    sharing nothing) reads NOTHING from the compacted
    *    generation.
    *
    * Soundness of the split: the grid is append-only under document-
    * disjoint ingest, so summary membership is monotone (repeated
    * once = repeated forever), a non-member key has at most ONE
    * compacted owner, and compacted vs residual owner sets are
    * disjoint — total n_docs ≥ 2 iff member ∨ residual ≥ 2 ∨
    * (residual = 1 ∧ compacted = 1). Before the first [[compact]]
    * (no summary yet) the read falls back to counting owners over
    * the whole grid restricted to the requested keys (the pre-r14
    * shape). The rewrite itself is ∝ requested docs; a full-corpus
    * request degrades gracefully to the honest one-shot cost. */
  def removalView(spark: SparkSession, gridTable: String,
      docs: DataFrame, spanLen: Int = 8,
      probeCap: Int = 8192): DataFrame = {
    AppendGrid.recover(spark, gridTable)
    spark.catalog.refreshTable(gridTable)
    // a drifted spanLen would probe a disjoint md5 keyspace and
    // silently cut nothing — fail fast instead
    requireSpanLen(spark, gridTable, spanLen)
    val wmB = committedBatch(spark, gridTable)
    val reqOcc = DedupOps.spanOccurrences(docs, spanLen)
    val reqKeys = reqOcc.select("span_key").distinct()
    // snapshot-consistent: an open crash window's generation is
    // invisible until its batch commits. resolved() re-stamps
    // bucket-compacted rows to their coverage generation, which keeps
    // every _b-vs-fence predicate below EXACT — a bucket compacted
    // past the summary's generation g serves its folded history as
    // "residual" (owner counts stay right, scans inflate toward the
    // whole bucket until the next full compact() refreshes the
    // summary; see [[compactBuckets]])
    val grid = AppendGrid.resolvedLive(spark, gridTable, "doc_id")
      .filter(col("_b") <= wmB)
    val repT = repTable(gridTable)
    val repGen: Option[Long] =
      if (spark.catalog.tableExists(repT))
        CdcMerge.tableProp(spark, repT, RepGenProp).map(_.toLong)
      else None
    val repeated = repGen match {
      case Some(g) =>
        spark.catalog.refreshTable(repT)
        // requested keys already known repeated (∝ repeated mass)
        val repHit = spark.table(repT).select("span_key")
          .join(reqKeys, Seq("span_key"), "left_semi")
        // residual owner count per requested key (∝ recent batches —
        // generation partitions above g are pruned-in, the compacted
        // generation pruned-out)
        val residual = grid.filter(col("_b") > g)
          .join(reqKeys, Seq("span_key"), "left_semi")
          .groupBy("span_key").agg(count(lit(1)).as("_r"))
        val resRep = residual.filter(col("_r") >= 2)
          .select("span_key")
        // the ONLY keys whose compacted count matters: exactly one
        // residual owner, not already known repeated — repeated iff
        // their (≤1) compacted owner exists
        val case2 = residual.filter(col("_r") === 1)
          .select("span_key")
          .join(repHit, Seq("span_key"), "left_anti")
        val nBuckets = CdcMerge.tableNBuckets(spark, gridTable)
          .getOrElse(32)
        val c2 = case2
          .withColumn("_kb",
            pmod(xxhash64(col("span_key")), lit(nBuckets.toLong)))
          .limit(probeCap + 1).collect()
        val probeHit =
          if (c2.isEmpty) reqKeys.limit(0)
          else if (c2.length <= probeCap) {
            // point-probe: _kb literals prune directory partitions,
            // the span_key IN filter pushes to parquet (bucket files
            // are span_key-sorted by compact — row groups skip)
            val keys = c2.map(_.getString(0)).toSeq
            val kbs = c2.map(_.getLong(1)).distinct.toSeq
            grid.filter(col("_b") <= g &&
                col("_kb").isin(kbs: _*) &&
                col("span_key").isin(keys: _*))
              .select("span_key")
          } else
            // degenerate probe set (≈ full-corpus request): a
            // broadcast semi-join scan of the compacted generation —
            // still cheaper than the whole-grid owner count, which
            // would SHUFFLE every requested key (measured: the
            // summary∪residual∪semi plan shuffles only repeated mass
            // + case2)
            grid.filter(col("_b") <= g)
              .join(case2, Seq("span_key"), "left_semi")
              .select("span_key")
        repHit.union(resRep).union(probeHit).distinct()
      case None =>
        // no summary yet (never compacted): count owners over the
        // whole grid restricted to the requested keys
        wholeGridRepeated(grid, reqKeys)
    }
    val occ = reqOcc
      .join(repeated, Seq("span_key"), "left_semi")
      .select(col("doc_id"), col("pos"))
    DedupOps.cutSpans(docs, occ, spanLen)
  }

  /** Repeated keys among `reqKeys` by counting owners over the whole
    * committed grid — exact because the grid PK is (span_key, doc_id).
    * The pre-summary read shape, and the cheapest exact plan for
    * corpus-sized requests. */
  private def wholeGridRepeated(grid: DataFrame,
      reqKeys: DataFrame): DataFrame =
    grid.join(reqKeys, Seq("span_key"), "left_semi")
      .groupBy("span_key")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("span_key")

  /** Fold all `_b` generations into the newest one — one file per
    * bucket again (span_key-sorted within each bucket, so the
    * removalView point-probe can skip row groups), via the shared
    * [[AppendGrid.compact]] machinery: staged rewrite +
    * crash-recoverable rename chain, graft.* lifetime properties
    * carried on the stage, and FENCED on the batch watermark (a
    * generation above the watermark is an open crash window whose
    * replay would overwrite the compacted generation — compact
    * refuses until the batch is re-delivered).
    *
    * Additionally REBUILDS the `_rep` summary — the repeated span
    * keys (n_docs ≥ 2) as of the compacted generation, the
    * ∝-repeated-mass table [[removalView]] serves from. One aggregate
    * over the grid this offline job already rewrites; written via the
    * crash-safe [[TableSwap]] swap, generation recorded as a table
    * property AFTER the swap (a crash in between leaves the property
    * stale — sound, see [[RepGenProp]]).
    *
    * Run offline on cadence, single-writer (pause the ingest
    * stream). */
  def compact(spark: SparkSession, gridTable: String): Unit = {
    val g = AppendGrid.compact(spark, gridTable, (grid, maxB) => {
      val cols = grid.columns
      // rows are immutable — compaction only re-stamps the generation
      grid.withColumn("_b", lit(maxB))
        .select(cols.toSeq.map(col): _*)
    }, sortCols = Seq("span_key"), delKey = Some("doc_id"))
    refreshRepSummary(spark, gridTable, g)
  }

  /** Advance the `_rep` repeated-key summary from its recorded
    * generation g to the committed watermark INCREMENTALLY — cost ∝
    * residual generations + repeated mass, never grid-sized (the
    * full-compact refresh rebuilds from the whole grid; this is the
    * cadence-friendly path). Soundness: summary membership is
    * monotone and owners only grow, so every key NEWLY repeated since
    * g gained ≥ 1 owner in the residual — newly-repeated = (≥ 2
    * residual owners) ∪ (exactly 1 residual owner, not already in the
    * summary, whose single compacted owner exists: the removalView
    * case-2 point-probe, `probeCap` fallback to a semi-join). The new
    * summary = old ∪ newly-repeated, swapped crash-safe, generation
    * property advanced to the watermark AFTER the swap (a crash
    * between leaves it stale — monotone-sound, see [[RepGenProp]]).
    * No-op before the first [[compact]] (no summary to advance). */
  def advanceRepSummary(spark: SparkSession, gridTable: String,
      probeCap: Int = 8192): Unit = {
    AppendGrid.recover(spark, gridTable)
    spark.catalog.refreshTable(gridTable)
    val repT = repTable(gridTable)
    if (!spark.catalog.tableExists(repT)) return
    val g = CdcMerge.tableProp(spark, repT, RepGenProp)
      .map(_.toLong).getOrElse(return)
    val wmB = committedBatch(spark, gridTable)
    if (wmB <= g) return
    spark.catalog.refreshTable(repT)
    val rep = spark.table(repT).select("span_key").localCheckpoint()
    val grid = AppendGrid.resolvedLive(spark, gridTable, "doc_id")
      .filter(col("_b") <= wmB)
    val residual = grid.filter(col("_b") > g)
      .groupBy("span_key").agg(count(lit(1)).as("_r"))
      .localCheckpoint() // ∝ recent batches; read twice below
    val resRep = residual.filter(col("_r") >= 2).select("span_key")
    val case2 = residual.filter(col("_r") === 1).select("span_key")
      .join(rep, Seq("span_key"), "left_anti")
    val nBuckets = CdcMerge.tableNBuckets(spark, gridTable)
      .getOrElse(32)
    val c2 = case2
      .withColumn("_kb",
        pmod(xxhash64(col("span_key")), lit(nBuckets.toLong)))
      .limit(probeCap + 1).collect()
    val probeHit =
      if (c2.isEmpty) rep.limit(0)
      else if (c2.length <= probeCap) {
        val keys = c2.map(_.getString(0)).toSeq
        val kbs = c2.map(_.getLong(1)).distinct.toSeq
        grid.filter(col("_b") <= g &&
            col("_kb").isin(kbs: _*) &&
            col("span_key").isin(keys: _*))
          .select("span_key")
      } else
        grid.filter(col("_b") <= g)
          .join(case2, Seq("span_key"), "left_semi")
          .select("span_key")
    val newSummary = rep.unionByName(resRep).unionByName(probeHit)
      .distinct()
    TableSwap.writeStagedSpread(spark, newSummary, repT,
      col("span_key"))
    CdcMerge.setTableProp(spark, repT, RepGenProp, wmB.toString)
  }

  /** INCREMENTAL compaction ([[AppendGrid.compactBuckets]]): fold only
    * the buckets with ≥ `minParts` live generations, cost ∝ fragmented
    * buckets, no table rename, untouched buckets byte-identical. Rows
    * are immutable, so the per-bucket fold is the same identity
    * re-stamp as [[compact]]'s (bucket files stay span_key-sorted for
    * the removalView point-probe).
    *
    * The `_rep` summary is ADVANCED FIRST (incrementally —
    * [[advanceRepSummary]], ∝ residual + repeated mass): a compacted
    * bucket re-stamps its folded history to the compaction fence, so
    * compacting with a stale summary would turn that bucket's whole
    * history into removalView "residual" until the next full
    * [[compact]]; with the summary at the fence the residual is empty
    * and the ∝-repeated-mass serve holds through bucket compaction.
    * (Before the first full compact there is no summary — reads use
    * the whole-grid fallback and bucket compaction is unconditionally
    * safe.) */
  def compactBuckets(spark: SparkSession, gridTable: String,
      minParts: Int = 4): Seq[Long] = {
    advanceRepSummary(spark, gridTable)
    AppendGrid.compactBuckets(spark, gridTable, (live, fence) => {
      val cols = live.columns
      live.withColumn("_b", lit(fence)).select(cols.toSeq.map(col): _*)
    }, dataCols = Seq("span_key", "doc_id", "n_occ"),
      sortCols = Seq("span_key"), minParts = minParts,
      delKey = Some("doc_id"))
  }

  /** Rebuild the `_rep` repeated-key summary covering generations
    * `_b <= g`. */
  private def refreshRepSummary(spark: SparkSession, gridTable: String,
      g: Long): Unit = {
    val rep = AppendGrid.resolvedLive(spark, gridTable, "doc_id")
      .filter(col("_b") <= g)
      .groupBy("span_key")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("span_key")
    TableSwap.writeStagedSpread(spark, rep, repTable(gridTable),
      col("span_key"))
    CdcMerge.setTableProp(spark, repTable(gridTable), RepGenProp,
      g.toString)
  }

  /** Continuous maintenance: foreachBatch [[applyBatch]] under the
    * stream's own monotone batch ids. */
  def startIngestStream(df: DataFrame, gridTable: String,
      checkpointDir: String, spanLen: Int = 8, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, gridTable, batch, batchId,
          spanLen, nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
