package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-corpus curation operators beyond dedup: sequence packing,
  * benchmark decontamination, and corpus clustering — the last-mile
  * steps between a cleaned document set and a training run.
  */
object CurationOps {

  /** Sequence packing: assign documents, in deterministic `doc_id`
    * order, to cumulative token-budget bins — the batch analogue of
    * packing documents into fixed-length training sequences.
    *
    * Packing is inherently sequential (each doc's bin depends on the
    * running token total), so it is SHARDED: docs are split into
    * `shards` deterministic streams (`doc_id mod shards`) and the
    * running sum is a window PARTITIONED by shard — shards is the
    * parallelism knob, sized to the cluster (each shard's window is
    * one task over corpus/shards rows). This is also how training
    * pipelines actually pack: per-worker, not globally — a global
    * running sum would be the single-task window this library bans.
    *
    * Returns per-doc rows: doc_id, shard, n_tokens, cum_tokens, bin
    * (a doc lands in the bin its last token falls into; zero-token
    * docs at the head of a shard have cum_tokens 0, clamped into bin 0
    * — without the clamp, `-1 div budget` is 0 under Spark's
    * truncating `div` but -1 under floor-division engines, an
    * engine-dependent bin id for an empty doc). */
  def packSequences(docs: DataFrame, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        pmod(col("doc_id"), lit(shards)).as("shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        expr(s"greatest(cum_tokens - 1, 0L) div $budget"))
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minOverlap` distinct shingles with the eval/benchmark subset.
    *
    * `shingles` is the exploded distinct (doc_id, shingle) set (e.g.
    * [[DedupOps.docShingles]]); `isEval` marks the benchmark rows.
    * The eval shingle vocabulary is benchmark-sized (tiny next to the
    * corpus), so the overlap probe is one equi-join of the corpus
    * shingles against it (broadcast when small — Catalyst decides from
    * stats) followed by a map-side-combined count per doc. Work scales
    * with true overlaps, never corpus². */
  def contamination(shingles: DataFrame, isEval: Column,
      minOverlap: Int = 3): DataFrame = {
    val evalSh = shingles.filter(isEval).select("shingle").distinct()
    shingles.filter(!isEval)
      .join(evalSh, Seq("shingle"))
      .groupBy("doc_id")
      // rows are distinct (doc_id, shingle): count == distinct overlap
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Deterministic mixture sampling: per-stratum inclusion rates (out
    * of 256) keyed on a content-independent hash of the id — the
    * training-mixture knob ("keep 25% of en, all of de, ...") with the
    * property RAND() lacks: stable under reprocessing and
    * repartitioning, so a resumed or re-run pipeline selects the SAME
    * documents. Pure codegen filter, no shuffle; strata missing from
    * `rates256` default to rate 0 (excluded). */
  def mixtureSample(docs: DataFrame, strataCol: String,
      rates256: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(
      md5(col(idCol).cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long")
    val rate = rates256.foldLeft(lit(0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .withColumn("rate256", rate)
      .filter(col("bucket") < col("rate256"))
  }

  /** K-means assignment step over an embedding corpus (cosine): each
    * vector's nearest centroid, via the shared
    * [[SimilarityOps.rankedCellAssignments]] broadcast-scan. The
    * building block for semantic clustering in data curation
    * (cluster-balanced sampling, per-cluster quality review).
    * Returns (vec_id, cid, ccos). */
  def assignClusters(embs: DataFrame, dim: Int = 64,
      nCentroids: Int = 8): DataFrame =
    SimilarityOps.rankedCellAssignments(embs, dim, nCentroids)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("ccos"))
}
