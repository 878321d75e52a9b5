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
  * Per-batch cost: one batch-sized component-graph CC (cluster
  * diameters, near-clique in dedup graphs), one broadcast-join SCAN
  * of the label table to find rows of merged components (no shuffle
  * of the table — the relabel map is batch-bounded and broadcasts),
  * and a [[CdcMerge]] upsert that rewrites only the hash buckets
  * containing relabeled/new docs. The scan is the honest price of
  * keying the table by doc_id (the serving-side access path — splits
  * and dedup joins look up BY DOC); avoiding it would need a
  * component→doc inverted index, table maintenance this corpus size
  * does not yet justify.
  *
  * Replay: a redelivered batch is skipped by the `_batch` watermark;
  * even without it the merge is content-idempotent (replayed pairs
  * map to endpoints ALREADY sharing a component → self-edges → no
  * relabels), so at-least-once delivery converges regardless.
  */
object IncrementalCC {

  /** Fold one batch of undirected pairs (doc_a, doc_b) into the label
    * table. Pairs may arrive in any batching — no disjointness
    * assumption; cross-batch merges are the point. */
  def applyBatch(spark: SparkSession, labelTable: String,
      pairs: DataFrame, batchId: Long, nBuckets: Int = 8): Unit = {
    require(spark eq pairs.sparkSession,
      s"applyBatch($labelTable): `spark` must be the batch's own " +
        "session (reads/writes are pinned to pairs.sparkSession)")
    val exists = spark.catalog.tableExists(labelTable)
    if (exists) {
      spark.catalog.refreshTable(labelTable)
      val last = spark.table(labelTable)
        .agg(coalesce(max("_batch"), lit(-1L))).head().getLong(0)
      if (batchId <= last) return
    }
    val batch = pairs.select(col("doc_a"), col("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .localCheckpoint() // batch-bounded; read several times below
    val ends = batch.select(col("doc_a").as("doc_id"))
      .unionByName(batch.select(col("doc_b").as("doc_id")))
      .distinct()
    // labels of batch endpoints: broadcast the batch-bounded endpoint
    // set against the table — scan-side join, the table never shuffles
    val endLabels = (if (exists)
        spark.table(labelTable).select(col("doc_id"), col("component"))
          .join(broadcast(ends), Seq("doc_id"))
      else ends.limit(0).withColumn("component", col("doc_id")))
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
    // rows to upsert: existing docs of merged components (found via a
    // broadcast-join scan of the table) + the batch's new docs
    val changed = (if (exists)
        spark.table(labelTable).select(col("doc_id"), col("component"))
          .join(broadcast(relabel), col("component") === col("oldc"))
          .select(col("doc_id"), col("newc").as("component"))
      else endLabels.limit(0))
    val fresh = newEnds
      .join(broadcast(relabel), col("doc_id") === col("oldc"),
        "left_outer")
      .select(col("doc_id"),
        coalesce(col("newc"), col("doc_id")).as("component"))
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
    * streaming pair frame; foreachBatch's monotone batchId is the
    * replay watermark. */
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
