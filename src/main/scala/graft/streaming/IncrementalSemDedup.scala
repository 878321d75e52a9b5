package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Incrementally-maintained SEMANTIC dedup — the streaming
  * counterpart of [[graft.operators.SimilarityOps.semanticDedup]]
  * (emb27) and the embedding-space sibling of [[IncrementalDedup]]
  * (lexical MinHash/LSH): a continuously-ingested corpus keeps a
  * table of KEPT representatives, and each new batch is admitted or
  * flagged against it with work bounded by the batch — never a
  * corpus-wide re-dedup per ingest.
  *
  * Semantics (arrival-order, the standard streaming-dedup contract —
  * deliberately NOT equal to a one-shot over the union, because a
  * later arrival can never evict an already-kept representative):
  * a batch member is a duplicate iff its cosine reaches `tauPpm` to
  *  (a) any KEPT representative from an earlier batch in its cell, or
  *  (b) any BETTER-RANKED member of its own batch in its cell
  *      (centroid-cosine desc, ties on vec_id — emb27's one-pass
  *      rank gate, kept-or-not).
  * Rule (b) makes a single batch over an empty state EXACTLY
  * [[SimilarityOps.semanticDedup]] — the equivalence the spec pins —
  * and keeps the per-batch pass join-expressible with no greedy
  * chain. Kept members (not duplicates) append to the representative
  * state; decisions for ALL members (kept and dup) append to the
  * same table, so the table doubles as the dedup audit log.
  *
  * Scale shape: coarse centroids are FROZEN at creation
  * ([[IncrementalAnn]]'s doctrine — cell ids must not move under a
  * serving index; re-training is an offline blue/green rebuild).
  * Per batch: one broadcast assignment against ≤ nCells centroid
  * rows, one cid EQUI-join of the batch against the kept reps of its
  * touched cells (partition-pruned — the state table is
  * directory-partitioned on cid), and a within-batch cell-bounded
  * pairwise pass. The rep-side join is the one that must not grow
  * with the corpus, and it structurally cannot: kept reps are
  * pairwise > τ apart BY CONSTRUCTION, so the reps of a cell form a
  * τ-packing of its cap of the unit sphere — their count is bounded
  * by the packing number (geometry), not by how many vectors ever
  * arrived. Streaming semantic dedup is the rare incremental
  * operator whose state saturates.
  *
  * Replay: a redelivered batch id is skipped by the `_batch`
  * watermark; even without it, already-decided vec_ids are
  * anti-joined away, so at-least-once delivery appends nothing twice.
  */
object IncrementalSemDedup {

  private def centTable(table: String) = s"${table}_centroids"

  /** Fold one batch of (vec_id, embedding) rows into the decision
    * table. On first call the state is created and the first
    * `nCells` vectors of the batch (by vec_id, deterministic) become
    * the frozen coarse centroids. */
  def applyBatch(spark: SparkSession, table: String, batch: DataFrame,
      batchId: Long, dim: Int = 64, nCells: Int = 8,
      tauPpm: Long = 350000L): Unit = FoldTimer.timed {
    require(spark eq batch.sparkSession,
      s"applyBatch($table): `spark` must be the batch's own session " +
        "(all reads/writes are pinned to batch.sparkSession)")
    val s = batch.sparkSession
    val exists = s.catalog.tableExists(table)
    if (exists) {
      s.catalog.refreshTable(table)
      val last = s.table(table)
        .agg(coalesce(max("_batch"), lit(-1L))).head().getLong(0)
      if (batchId <= last) return
    } else {
      CdcMerge.dropStateTable(s, table)
      CdcMerge.dropStateTable(s, centTable(table))
      val seeds = batch.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      require(!seeds.isEmpty,
        s"applyBatch($table): creating the state but the first batch " +
          "is empty; route seed vectors into the first batch")
      seeds.coalesce(1)
        .write.format("parquet").saveAsTable(centTable(table))
    }
    val cent = s.table(centTable(table))
    val fresh0 = SimilarityOps.assignToCentroids(batch, cent, dim)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("en"), col("cid"),
        col("ccos"))
    val fresh = (if (exists)
      fresh0.join(s.table(table).select("vec_id"), Seq("vec_id"),
        "left_anti")
    else fresh0)
    val wRank = Window.partitionBy(col("cid"))
      .orderBy(col("ccos").desc, col("vec_id"))
    val ranked = fresh.withColumn("crnk", row_number().over(wRank))
    val ppm = (e: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =>
      floor(SimilarityOps.dot(col("embedding"), e, dim) /
        (col("en") * n) * lit(1000000.0)).cast("long")
    // (a) vs earlier-batch kept reps of the same cell
    val vsReps = if (exists) {
      val reps = s.table(table).filter(!col("is_dup"))
        .select(col("cid"), col("embedding").as("r_emb"),
          col("en").as("r_en"))
      ranked.join(reps, Seq("cid"))
        .select(col("cid"), col("vec_id"),
          ppm(col("r_emb"), col("r_en")).as("p"))
    } else ranked.limit(0)
      .select(col("cid"), col("vec_id"), lit(-1000000L).as("p"))
    // (b) vs better-ranked members of this batch in the same cell
    val better = ranked.select(col("cid"),
      col("embedding").as("b_emb"), col("en").as("b_en"),
      col("crnk").as("b_rnk"))
    val vsBatch = ranked.join(better, Seq("cid"))
      .filter(col("b_rnk") < col("crnk"))
      .select(col("cid"), col("vec_id"),
        ppm(col("b_emb"), col("b_en")).as("p"))
    val best = vsReps.unionByName(vsBatch)
      .groupBy("cid", "vec_id").agg(max(col("p")).as("bp"))
    val decisions = ranked.join(best, Seq("cid", "vec_id"), "left")
      .select(col("vec_id"), col("embedding"), col("en"),
        coalesce(col("bp"), lit(-1000000L)).as("best_kept_ppm"),
        (coalesce(col("bp"), lit(-1000000L)) >= tauPpm).as("is_dup"),
        lit(batchId).as("_batch"), col("cid"))
    if (exists)
      decisions.repartition(col("cid"))
        .select(s.table(table).columns.toSeq.map(col): _*)
        .write.mode("append").insertInto(table)
    else
      decisions.repartition(col("cid"))
        .write.format("parquet").partitionBy("cid").saveAsTable(table)
  }

  /** All decisions so far (vec_id, cid, best_kept_ppm, is_dup,
    * _batch) — kept reps are the `!is_dup` rows. */
  def readDecisions(spark: SparkSession, table: String): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.table(table)
      .select(col("vec_id"), col("cid"), col("best_kept_ppm"),
        col("is_dup"), col("_batch"))
  }
}
