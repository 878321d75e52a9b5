package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Incremental IVF (inverted-file) ANN index maintenance: keep the
  * cell-partitioned embedding index in a table and assign each NEW
  * batch of vectors against the FIXED coarse centroids — the embedding
  * counterpart of [[IncrementalDedup]], and the operator that makes a
  * continuously-growing vector corpus searchable without re-clustering
  * the world per ingest batch (O(batch) assignment work, O(probed
  * cells) search work).
  *
  * Design:
  *
  *  - Coarse centroids are FROZEN at index creation and stored in
  *    `{table}_centroids` (metadata-sized). Every later batch assigns
  *    against the stored set — cell ids stay stable forever, so the
  *    index only ever appends. (Re-training centroids is a separate
  *    offline rebuild, like [[CdcMerge.rebucket]] for hash buckets —
  *    the serving index must not re-shuffle on ingest.)
  *  - The index table is DIRECTORY-partitioned on `cid`: a search with
  *    `nProbe` cells reads only those partitions (partition pruning /
  *    DPP through the cell equi-join), and a batch append writes only
  *    the cells it touches.
  *  - Replay-safe: already-indexed `vec_id`s are anti-joined away, so
  *    a redelivered batch appends nothing (at-least-once upstream →
  *    exactly-once index).
  *  - Search is [[SimilarityOps.ivfTopKProbed]]'s plan over the stored
  *    table: broadcast the (tiny) query set against the probed cells'
  *    partitions — the corpus side is never shuffled.
  */
object IncrementalAnn {

  private[graft] def centTable(table: String) =
    s"${table}_centroids"

  private def wmTable(table: String) = s"${table}_wm"

  /** OPTIONAL batch watermark for pipelines that need the index to
    * participate in a cross-index wave ([[WaveMark]]): the index
    * itself needs no fence (appends are anti-join idempotent and rows
    * carry no batch stamps), but a fused serve needs to KNOW which
    * batch the index includes to detect version skew. Call after
    * [[indexBatch]] returns; 1-row [[TableSwap]] staged swap. */
  def commitBatch(spark: SparkSession, table: String,
      batchId: Long): Unit = {
    import spark.implicits._
    // monotone watermark: append-commit (TableSwap.appendCommit)
    TableSwap.appendCommit(spark, Seq(batchId).toDF("_batch"),
      wmTable(table))
  }

  /** The committed batch id recorded by [[commitBatch]] (-1 before
    * the first commit). */
  def committed(spark: SparkSession, table: String): Long = {
    val wm = wmTable(table)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (!spark.catalog.tableExists(wm)) -1L
    else spark.table(wm)
      .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
  }

  /** Index one batch of (vec_id, embedding) rows. On first call the
    * index is created and the first `nCentroids` vectors of the batch
    * (by `vec_id`, deterministic) become the frozen coarse centroids. */
  def indexBatch(spark: SparkSession, table: String, batch: DataFrame,
      dim: Int = 64, nCentroids: Int = 8): Unit = FoldTimer.timed {
    // reads and writes pinned to the BATCH's session (the
    // IncrementalDedup.indexBatch session-split hazard), plus a
    // refresh so appends from other sessions are visible; the require
    // makes the pinning contract explicit instead of silently
    // ignoring a mismatched `spark` argument
    require(spark eq batch.sparkSession,
      s"indexBatch($table): `spark` must be the batch's own session " +
        "(all reads/writes are pinned to batch.sparkSession)")
    val s = batch.sparkSession
    if (!s.catalog.tableExists(table)) {
      CdcMerge.dropStateTable(s, table)
      CdcMerge.dropStateTable(s, centTable(table))
      // the documented semantics, literally: the first nCentroids
      // vectors of the batch in vec_id order seed the frozen
      // centroids (TakeOrderedAndProject — a top-k, never a global
      // sort), so any non-empty first batch creates a working index
      // regardless of its id range; cid is the seeding vec_id.
      val seeds = batch.orderBy(col("vec_id")).limit(nCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      // an empty centroid set would silently build a degenerate index
      // (every assignment drops out of the cross join) — fail loudly;
      // the caller either routes seed vectors into the first batch or
      // creates via retrainTo with trained centroids
      require(!seeds.isEmpty,
        s"indexBatch($table): creating the index but the first batch " +
          "is empty; seed the first batch or create the index via " +
          "retrainTo with an explicit centroid set")
      seeds.coalesce(1)
        .write.format("parquet").saveAsTable(centTable(table))
      assigned(s, table, batch, dim)
        .repartition(col("cid"))
        .write.format("parquet").partitionBy("cid").saveAsTable(table)
      return
    }
    s.catalog.refreshTable(table)
    val asg = assigned(s, table, batch, dim)
    // replay guard PRUNED to the batch's own cells: a previously
    // indexed copy of a batch vector sits in the SAME cell (the
    // frozen-centroid assignment is deterministic), so the anti-join
    // only needs those cells' rows — ∝ touched cells × cell size,
    // where the unpruned guard read the whole index's vec_id column
    // (measured corpus-proportional in the r15 knn fold probe)
    val cids = asg.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val fresh = asg
      .join(s.table(table).filter(col("cid").isin(cids: _*))
        .select("vec_id"), Seq("vec_id"), "left_anti")
    fresh.select(s.table(table).columns.toSeq.map(col): _*)
      .repartition(col("cid"))
      .write.mode("append").insertInto(table)
  }

  /** [[indexBatch]] for a caller that already holds the batch's
    * rank-1 frozen-centroid assignment and its touched-cell list (the
    * kNN-graph fold computes both anyway): skips the duplicate
    * assignment pipeline and the touched-cell collect — two control-
    * plane jobs per fold, measured in the r16 fold attribution.
    * `members` must be (vec_id, embedding, en, cid) rank-1 rows
    * against THIS index's frozen centroids; `cids` their distinct
    * cell ids. Replay guard identical to [[indexBatch]]. */
  private[streaming] def indexBatchAssigned(spark: SparkSession,
      table: String, members: DataFrame, cids: Seq[Long]): Unit = {
    spark.catalog.refreshTable(table)
    val fresh = members
      .join(spark.table(table).filter(col("cid").isin(cids: _*))
        .select("vec_id"), Seq("vec_id"), "left_anti")
    fresh.select(spark.table(table).columns.toSeq.map(col): _*)
      .repartition(col("cid"))
      .write.mode("append").insertInto(table)
  }

  private def assigned(spark: SparkSession, table: String,
      batch: DataFrame, dim: Int): DataFrame =
    SimilarityOps.assignToCentroids(batch, spark.table(centTable(table)),
        dim)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("en"), col("cid"))

  /** Offline centroid re-training as a BLUE/GREEN rebuild — the
    * service that lifts "centroids are frozen at creation" (the
    * [[CdcMerge.rebucket]] analogue for cells): all vectors of
    * `fromTable` re-assign against `newCentroids` (e.g. a
    * [[graft.operators.CurationOps]] k-means result) into a fresh
    * index under `toTable`, with its own frozen centroid table.
    * Blue/green instead of in-place: the serving pair (index,
    * centroids) must never be observed mismatched, and a reader alias
    * flip — point searches at `toTable` when it is complete, then
    * drop the old pair — is how production vector stores actually
    * ship an index rebuild. The old index keeps serving (and keeps
    * accepting [[indexBatch]] appends) until the flip; batches
    * ingested after the rebuild's read are re-indexed into the new
    * table by the caller replaying them, or by a second incremental
    * catch-up pass over `fromTable` rows absent from `toTable`. */
  def retrainTo(spark: SparkSession, fromTable: String, toTable: String,
      newCentroids: DataFrame, dim: Int = 64): Unit = {
    require(fromTable != toTable,
      "blue/green rebuild requires a fresh table name")
    require(!newCentroids.isEmpty,
      s"retrainTo($toTable): empty centroid set would build a " +
        "degenerate index")
    CdcMerge.dropStateTable(spark, toTable)
    CdcMerge.dropStateTable(spark, centTable(toTable))
    newCentroids.select(col("cid"), col("ce")).coalesce(1)
      .write.format("parquet").saveAsTable(centTable(toTable))
    spark.catalog.refreshTable(fromTable) // cross-session appends
    assigned(spark, toTable,
        spark.table(fromTable).select("vec_id", "embedding"), dim)
      .repartition(col("cid"))
      .write.format("parquet").partitionBy("cid").saveAsTable(toTable)
  }

  /** Incremental catch-up for a blue/green flip: index into `toTable`
    * every vector `fromTable` holds that `toTable` does not yet (the
    * appends that landed on the old index while the rebuild ran). */
  def catchUp(spark: SparkSession, fromTable: String,
      toTable: String, dim: Int = 64): Unit = {
    spark.catalog.refreshTable(fromTable) // cross-session appends
    indexBatch(spark, toTable,
      spark.table(fromTable).select("vec_id", "embedding"), dim)
  }

  private val DelEpochProp = "graft.delepoch"

  /** Monotone DELETE EPOCH: how many [[deleteVectors]] calls have
    * mutated this index. Deletion here is PHYSICAL (no tombstone
    * ledger to count), so the epoch lives in a table property bumped
    * before each mutating delete; with the committed batch id it
    * versions the index for multi-index consumers ([[WaveMark]]) —
    * an erasure mutates the served index without moving the
    * watermark. */
  def mutationEpoch(spark: SparkSession, table: String): Long =
    if (!spark.catalog.tableExists(table)) 0L
    else CdcMerge.tableProp(spark, table, DelEpochProp)
      .map(_.toLong).getOrElse(0L)

  /** Erasure for the vector index — the embeddings
    * right-to-be-forgotten path (a training-data platform that stores
    * user-derived vectors needs deletion as much as the text side
    * needs [[graft.functions.TextFunctions.redactPii]]): remove the
    * given `ids` ((vec_id) frame — erasure lists can be large, so no
    * driver-side seq) from the index. Partition-pruned like every
    * consumer write: only cells containing hits are rewritten
    * (dynamic overwrite); a cell drained to zero rows is dropped
    * outright (unlike the SCD2 vacuum, cells genuinely can drain).
    * Returns the number of vectors removed; idempotent — re-deleting
    * removes nothing (and leaves [[mutationEpoch]] unchanged). A
    * later [[indexBatch]] carrying a deleted vec_id re-indexes it
    * (re-insertion semantics, the erasure contract's other half). */
  def deleteVectors(spark: SparkSession, table: String,
      ids: DataFrame): Long = {
    spark.catalog.refreshTable(table)
    val keyed = ids.select("vec_id")
    val hit = spark.table(table).join(keyed, Seq("vec_id"), "left_semi")
    // hit cells AND the removed count in ONE control-plane job
    val hitStats = hit.groupBy("cid").agg(count(lit(1)).as("n"))
      .collect()
    val cids = hitStats.map(_.getLong(0))
    if (cids.isEmpty) return 0L
    val removed = hitStats.map(_.getLong(1)).sum
    // bump the delete epoch BEFORE any mutation: this index has no
    // tombstone ledger (deletion is physical), so the epoch property
    // is what versions it for multi-index consumers ([[WaveMark]]) —
    // bumping first is conservative through a crash (a half-done
    // delete is also a version change; a bump with no mutation only
    // forces one spurious wave re-commit)
    CdcMerge.setTableProp(spark, table, DelEpochProp,
      (mutationEpoch(spark, table) + 1L).toString)
    val cols = spark.table(table).columns
    // materialize the kept rows of the hit cells once, then
    // dynamic-overwrite them in place (the CdcMerge.applyBatchKeyed
    // commit shape: checkpoint cuts the self-read lineage, global
    // temp view bridges into the session clone) — retires the staged
    // table this path wrote and re-read per delete
    val kept = CdcMerge.commitCheckpoint(spark.table(table)
      .filter(col("cid").isin(cids.toSeq: _*))
      .join(keyed, Seq("vec_id"), "left_anti")
      .repartition(col("cid")))
    try {
      val keptCids = kept.select("cid").distinct()
        .collect().map(_.getLong(0)).toSet
      val bridge = s"${table}_del_src"
      kept.createOrReplaceGlobalTempView(bridge)
      try CdcMerge.withDynamicOverwrite(spark) { w =>
        w.table(s"global_temp.$bridge").select(cols.toSeq.map(col): _*)
          .write.mode("overwrite").insertInto(table)
      } finally spark.catalog.dropGlobalTempView(bridge)
      val drained = cids.filterNot(keptCids)
      if (drained.nonEmpty) spark.sql(
        s"ALTER TABLE $table DROP IF EXISTS " +
          drained.map(c => s"PARTITION (cid=$c)").mkString(", "))
    } finally {
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .freeLocalCheckpoint(kept)
      ()
    }
    spark.catalog.refreshTable(table)
    removed
  }

  /** Multi-probe cosine top-k over the index: each query ranks the
    * stored centroids, probes its `nProbe` nearest cells, and scores
    * only those cells' rows — identical math and tie-breaks to
    * [[SimilarityOps.ivfTopKProbed]], but over the incrementally-built
    * table. `queries` is (query_id, q_emb). */
  def searchTopK(spark: SparkSession, table: String, queries: DataFrame,
      dim: Int = 64, nProbe: Int = 2, k: Int = 5): DataFrame = {
    // serving reads refresh first: the index is appended from ingest
    // sessions this reader can't observe through its relation cache
    spark.catalog.refreshTable(table)
    val q = SimilarityOps.assignToCentroids(
        queries.select(col("query_id").as("vec_id"),
          col("q_emb").as("embedding")),
        spark.table(centTable(table)), dim)
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), col("en").as("qn"), col("cid"))
    // probed-cell ids as LITERALS (a queries×nProbe-sized
    // control-plane job): static partition pruning on the cid
    // directory partitions, instead of relying on DPP through the
    // broadcast join to prune the scan — read ∝ the probed cells'
    // partitions, never the index
    val cids = q.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    spark.table(table).filter(col("cid").isin(cids: _*))
      .join(broadcast(q), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        SimilarityOps.dot(col("q_emb"), col("embedding"), dim) /
          (col("qn") * col("en")))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("cos"))
  }
}
