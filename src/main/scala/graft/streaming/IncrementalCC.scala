package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incrementally-maintained connected-component labels — the
  * clustering sibling of [[IncrementalDedup]] (which maintains the
  * near-dup PAIR list) and the last link in keeping leakage-safe
  * splits ([[graft.operators.CurationOps.leakageSafeSplit]]) fresh
  * under ingest: doc17/doc18/doc31 recompute components from the FULL
  * pair list on every call, an O(corpus-pairs) relabel per refresh,
  * while this table absorbs each pair batch with work bounded by the
  * batch and the clusters it touches.
  *
  * Union-find, distributively: the state is the label table
  * (doc_id, component) with component = the cluster's minimum doc_id
  * — exactly [[DedupOps.connectedComponents]]'s output contract. A
  * new pair batch can only MERGE existing components (or mint new
  * ones): map each batch pair's endpoints to their current labels,
  * run connected components on that COMPONENT-level graph (nodes =
  * touched component ids — batch-bounded, never the corpus), and the
  * resulting old→new label map broadcasts back. min() is associative,
  * so after any batch sequence the labels equal a one-shot CC over
  * the union of all batches — the cdc28 oracle pins batched == doc17
  * one-shot, and batch ORDER cannot matter.
  *
  * EVERY read is partition-pruned — no per-batch full scan of either
  * table (the r10 deferred cost, closed):
  *
  *  - the label table is a [[CdcMerge]] table keyed by doc_id
  *    (`_kb = hash(doc_id)` buckets — the serving-side access path:
  *    splits and dedup joins look up BY DOC). Batch endpoints' labels
  *    read only the endpoints' own `_kb` buckets.
  *  - a component→bucket-set INVERTED INDEX (`<table>_cidx`, itself a
  *    CdcMerge table keyed by component, `_kb = hash(component)`)
  *    maps each live component to the label-table buckets holding its
  *    members. Rows of a MERGED component are found by reading only
  *    those buckets — scan bytes ∝ touched components, not table
  *    size.
  *  - index maintenance is MONOTONE (bucket sets only grow: a merge
  *    unions the absorbed component's set into the survivor's, new
  *    docs add their own bucket). An over-approximate set is always
  *    safe — it can only cause extra pruned reads, never a missed
  *    member — which is what makes the two-table update crash-safe
  *    WITHOUT a write-ahead log: the index is updated FIRST, so any
  *    crash leaves it a superset of the truth, and the replayed batch
  *    recomputes the same relabel from the still-unchanged label
  *    table. Stale entries for absorbed components are never looked
  *    up again (no doc maps to an absorbed label, and labels are doc
  *    ids, so an absorbed id can never be re-minted).
  *
  * Per-batch cost: one batch-sized component-graph CC (cluster
  * diameters, near-clique in dedup graphs), pruned-bucket reads of
  * both tables, and two [[CdcMerge]] upserts that rewrite only the
  * touched hash buckets. Driver-side state is only bucket-id /
  * component-hash lists, each ≤ nBuckets (metadata-scale, like any
  * dynamic partition pruning).
  *
  * Replay: content-idempotent, with no watermark — a redelivered
  * batch's pairs map to endpoints ALREADY sharing a component →
  * self-edges → no relabels, no fresh docs → both upserts are empty
  * no-ops, so at-least-once delivery converges regardless of batch
  * id. (The previous `_batch`-watermark skip cost a full-table
  * max() scan per batch — the exact cost class this design removes —
  * and protected nothing the content idempotence doesn't.)
  */
object IncrementalCC {

  /** The inverted component→buckets index table backing `labelTable`. */
  def indexTable(labelTable: String): String = s"${labelTable}_cidx"

  /** Drop the label table, its index, and both stage twins (catalog +
    * warehouse location — see [[CdcMerge.dropStateTable]]). */
  def dropTables(spark: SparkSession, labelTable: String): Unit =
    Seq(labelTable, s"${labelTable}_stage", s"${labelTable}_old",
      indexTable(labelTable), s"${indexTable(labelTable)}_stage")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def kbOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets))

  /** Distinct long values of `col` in `df`, driver-side. Callers only
    * pass bucket ids / component hashes, so the result is ≤ nBuckets
    * values — metadata, not data. */
  private def collectLongs(df: DataFrame, c: String): Seq[Long] =
    df.select(col(c)).distinct().collect().map(_.getLong(0)).toSeq

  /** Fold one batch of undirected pairs (doc_a, doc_b) into the label
    * table. Pairs may arrive in any batching — no disjointness
    * assumption; cross-batch merges are the point. `batchId` is kept
    * as the `_batch` version column of both tables (audit trail +
    * CdcMerge survivor ordering); replay safety does not depend on it
    * (see scaladoc). */
  def applyBatch(spark: SparkSession, labelTable: String,
      pairs: DataFrame, batchId: Long, nBuckets: Int = 8): Unit = FoldTimer.timed {
    require(spark eq pairs.sparkSession,
      s"applyBatch($labelTable): `spark` must be the batch's own " +
        "session (reads/writes are pinned to pairs.sparkSession)")
    val idx = indexTable(labelTable)
    val exists = spark.catalog.tableExists(labelTable)
    if (exists) {
      spark.catalog.refreshTable(labelTable)
      // migration from a pre-index table: rebuild the inverted index
      // once (a full scan, paid exactly once per table lifetime)
      if (!spark.catalog.tableExists(idx)) {
        val rebuilt = spark.table(labelTable)
          .groupBy(col("component"))
          .agg(sort_array(collect_set(col("_kb"))).as("kbs"))
          .withColumn("_batch", lit(batchId - 1))
        CdcMerge.applyBatch(spark, idx, rebuilt, "component",
          Seq("_batch"), nBuckets)
      } else spark.catalog.refreshTable(idx)
    }
    val batch = pairs.select(col("doc_a"), col("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .localCheckpoint() // batch-bounded; read several times below
    val ends = batch.select(col("doc_a").as("doc_id"))
      .unionByName(batch.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint()
    // labels of batch endpoints: prune the label table to the
    // endpoints' own buckets (batch-bounded id list), then
    // broadcast-join the endpoint set — scan ∝ touched doc buckets
    val endLabels = (if (exists) {
        val endKbs = collectLongs(
          ends.select(kbOf(col("doc_id"), nBuckets).as("kb")), "kb")
        spark.table(labelTable)
          .filter(col("_kb").isin(endKbs: _*))
          .select(col("doc_id"), col("component"))
          .join(broadcast(ends), Seq("doc_id"))
      } else ends.limit(0).withColumn("component", col("doc_id")))
      .localCheckpoint()
    val newEnds = ends.join(endLabels, Seq("doc_id"), "left_anti")
    def endpoint(side: String): DataFrame = endLabels
      .select(col("doc_id").as(side), col("component").as(s"c_$side"))
    // component-level edges: endpoints map to their current labels
    // (own id when new); components only ever merge
    val cedges = batch
      .join(broadcast(endpoint("doc_a")), Seq("doc_a"), "left_outer")
      .join(broadcast(endpoint("doc_b")), Seq("doc_b"), "left_outer")
      .select(coalesce(col("c_doc_a"), col("doc_a")).as("doc_a"),
        coalesce(col("c_doc_b"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
      .localCheckpoint()
    // old label -> merged (min) label, restricted to actual changes —
    // batch-bounded both sides, broadcastable
    val relabel = DedupOps.connectedComponents(cedges)
      .select(col("doc_id").as("oldc"), col("component").as("newc"))
      .filter(col("oldc") =!= col("newc"))
      .localCheckpoint()
    // docs the batch adds, with their final labels
    val fresh = newEnds
      .join(broadcast(relabel), col("doc_id") === col("oldc"),
        "left_outer")
      .select(col("doc_id"),
        coalesce(col("newc"), col("doc_id")).as("component"))
      .localCheckpoint()

    // ---- inverted index: bucket sets of the ABSORBED components
    // (pruned index read), captured BEFORE any write below
    val oldcSets = (if (exists) {
        val oldcKbs = collectLongs(
          relabel.select(kbOf(col("oldc"), nBuckets).as("kb")), "kb")
        spark.table(idx).filter(col("_kb").isin(oldcKbs: _*))
          .join(broadcast(relabel), col("component") === col("oldc"))
          .select(col("newc").as("component"), col("kbs"))
      } else relabel.limit(0)
        .select(col("newc").as("component"),
          array().cast("array<bigint>").as("kbs")))
      .localCheckpoint()

    // index additions: survivors inherit the absorbed sets; fresh
    // docs add their own label-table bucket to their component's set
    val adds = oldcSets
      .select(col("component"), explode(col("kbs")).as("kb"))
      .unionByName(fresh.select(col("component"),
        kbOf(col("doc_id"), nBuckets).as("kb")))
      .groupBy("component")
      .agg(collect_set(col("kb")).as("addkbs"))
      .localCheckpoint()
    if (!adds.isEmpty) {
      // current sets of the affected components (pruned index read)
      val curSets = (if (exists) {
          val affKbs = collectLongs(
            adds.select(kbOf(col("component"), nBuckets).as("kb")),
            "kb")
          spark.table(idx).filter(col("_kb").isin(affKbs: _*))
            .select(col("component"), col("kbs"))
            .join(broadcast(adds.select("component")), Seq("component"))
        } else adds.limit(0).select(col("component"),
          col("addkbs").as("kbs")))
      val newSets = adds
        .join(curSets, Seq("component"), "left_outer")
        .select(col("component"),
          sort_array(array_union(
            coalesce(col("kbs"), array().cast("array<bigint>")),
            col("addkbs"))).as("kbs"))
        .withColumn("_batch", lit(batchId))
      // INDEX FIRST: over-approximation is safe, so a crash between
      // the two upserts leaves a superset index and an unchanged
      // label table — the replayed batch recomputes the same relabel
      CdcMerge.applyBatch(spark, idx, newSets, "component",
        Seq("_batch"), nBuckets)
    }

    // rows to upsert into the label table: existing members of merged
    // components — label table pruned to the buckets the index listed
    // for the ABSORBED components — plus the batch's fresh docs
    val changed = (if (exists) {
        val memberKbs = collectLongs(
          oldcSets.select(explode(col("kbs")).as("kb")), "kb")
        spark.table(labelTable)
          .filter(col("_kb").isin(memberKbs: _*))
          .select(col("doc_id"), col("component"))
          .join(broadcast(relabel), col("component") === col("oldc"))
          .select(col("doc_id"), col("newc").as("component"))
      } else endLabels.limit(0))
    val upserts = changed.unionByName(fresh)
      .withColumn("_batch", lit(batchId))
    CdcMerge.applyBatch(spark, labelTable, upserts, "doc_id",
      Seq("_batch"), nBuckets)
  }

  /** Current labels — one row per ever-paired doc, component = min
    * doc_id of its cluster (the [[DedupOps.connectedComponents]]
    * contract, served without any recompute). */
  def readLabels(spark: SparkSession, labelTable: String): DataFrame = {
    TableSwap.recover(spark, labelTable, s"${labelTable}_stage")
    spark.table(labelTable).select(col("doc_id"), col("component"))
  }

  /** Continuous maintenance: foreachBatch [[applyBatch]] over a
    * streaming pair frame; foreachBatch's monotone batchId versions
    * the `_batch` column (replay safety is content-level — see
    * scaladoc). */
  def startIngestStream(df: DataFrame, labelTable: String,
      checkpointDir: String, nBuckets: Int = 8,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, labelTable, batch, batchId,
          nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
