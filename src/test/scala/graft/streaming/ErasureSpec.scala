package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{MultimodalOps, SimilarityOps}

/** Erasure across the maintained-index family: index-after-delete ==
  * index-built-from-corpus-minus-deleted, through redelivery,
  * mid-stream compaction, re-insertion and idempotent re-delete. The
  * comparison target is a FRESH index over the reduced corpus (same
  * code path both sides — any tombstone leak or statistics drift
  * breaks exact equality, floats included). */
class ErasureSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  private def embs: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select("vec_id", "embedding")

  // the erased set D, the re-inserted subset R ⊆ D, and the two
  // reduced corpora the serves must land on
  private val isDel = (c: org.apache.spark.sql.Column) =>
    c % 7 === 3
  private val isRe = (c: org.apache.spark.sql.Column) =>
    c % 7 === 3 && c % 2 === 0

  private def dpart(i: Int) =
    docs.filter(pmod(col("doc_id"), lit(3)) === i)

  private def delIdsOf(df: DataFrame, key: String): DataFrame =
    df.filter(isDel(col(key))).select(key).distinct()

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("bm25: delete → compact → re-insert lands exactly on the " +
      "reduced-corpus index (df, N and avgdl included)") {
    val live = "er_bm25"
    val refT = "er_bm25_ref"
    (IncrementalBm25.tables(live) ++ IncrementalBm25.tables(refT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    val terms = Seq("spark", "merge", "window")
    def serve(t: String) =
      rowsOf(IncrementalBm25.queryView(spark, t, terms, k = 50))
    // live: 3 batches with batch 1 redelivered, then erase D
    Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
      IncrementalBm25.applyBatch(spark, live, dpart(p), b, nBuckets = 8)
    }
    val removed = IncrementalBm25.deleteDocs(spark, live,
      docs.filter(isDel(col("doc_id"))))
    assert(removed > 0)
    // reference: one fold over corpus-minus-D
    IncrementalBm25.applyBatch(spark, refT,
      docs.filter(!isDel(col("doc_id"))), 0L, nBuckets = 8)
    assert(serve(live) == serve(refT), "post-delete serve diverged")
    // physical reclamation must not change the serve; the ledger rows
    // must actually be GONE from the grid afterwards
    IncrementalBm25.compactBuckets(spark, live, minParts = 2)
    assert(serve(live) == serve(refT), "post-compaction serve diverged")
    assert(spark.table(live)
      .join(delIdsOf(docs, "doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "compaction left tombstoned postings in the grid")
    // idempotent re-delete: nothing visible to erase again
    assert(IncrementalBm25.deleteDocs(spark, live,
      docs.filter(isDel(col("doc_id")))) == 0L)
    // re-insert R under a fresh batch id; reference gets R in a
    // second batch
    IncrementalBm25.applyBatch(spark, live,
      docs.filter(isRe(col("doc_id"))), 3L, nBuckets = 8)
    val refT2 = "er_bm25_ref2"
    IncrementalBm25.tables(refT2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalBm25.applyBatch(spark, refT2,
      docs.filter(!isDel(col("doc_id")) || isRe(col("doc_id"))), 0L,
      nBuckets = 8)
    assert(serve(live) == serve(refT2), "re-insertion serve diverged")
  }

  test("containment: tombstoned docs leave df, prefixes and both " +
      "pair surfaces exactly") {
    val live = "er_cont"
    val refT = "er_cont_ref"
    (IncrementalContainment.tables(live) ++
      IncrementalContainment.tables(refT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    def serve(t: String) =
      rowsOf(IncrementalContainment.report(spark, t))
    Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
      IncrementalContainment.applyBatch(spark, live, dpart(p), b,
        nBuckets = 8)
    }
    IncrementalContainment.deleteDocs(spark, live,
      delIdsOf(docs, "doc_id"))
    IncrementalContainment.applyBatch(spark, refT,
      docs.filter(!isDel(col("doc_id"))), 0L, nBuckets = 8)
    assert(serve(live) == serve(refT), "post-delete report diverged")
    // batchPairs against the erased corpus: equals the reference's
    // batchPairs for the same probe batch
    val probe = docs.filter(!isDel(col("doc_id")) &&
      pmod(col("doc_id"), lit(3)) === 2)
    assert(
      rowsOf(IncrementalContainment.batchPairs(spark, live, probe)) ==
        rowsOf(IncrementalContainment.batchPairs(spark, refT, probe)),
      "batchPairs diverged after erasure")
    IncrementalContainment.compactBuckets(spark, live, minParts = 2)
    assert(serve(live) == serve(refT), "post-compaction report diverged")
    assert(spark.table(live)
      .join(delIdsOf(docs, "doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "compaction left tombstoned postings (inverted twin)")
    assert(spark.table(s"${live}_fwd")
      .join(delIdsOf(docs, "doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "compaction left tombstoned postings (forward twin)")
    // re-insert R
    IncrementalContainment.applyBatch(spark, live,
      docs.filter(isRe(col("doc_id"))), 3L, nBuckets = 8)
    val refT2 = "er_cont_ref2"
    IncrementalContainment.tables(refT2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalContainment.applyBatch(spark, refT2,
      docs.filter(!isDel(col("doc_id")) || isRe(col("doc_id"))), 0L,
      nBuckets = 8)
    assert(serve(live) == serve(refT2), "re-insertion report diverged")
  }

  test("media: tombstoned payloads leave the pair report and the " +
      "batch lookup exactly") {
    val live = "er_media"
    val refT = "er_media_ref"
    (IncrementalMediaDedup.tables(live) ++
      IncrementalMediaDedup.tables(refT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    val media = MultimodalOps.toMediaColumns(docs)
    def mpart(i: Int) =
      media.filter(pmod(col("doc_id"), lit(3)) === i)
    def serve(t: String) =
      rowsOf(IncrementalMediaDedup.report(spark, t))
    Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
      IncrementalMediaDedup.applyBatch(spark, live, mpart(p), b,
        nBuckets = 8)
    }
    IncrementalMediaDedup.deleteDocs(spark, live,
      delIdsOf(docs, "doc_id"))
    IncrementalMediaDedup.applyBatch(spark, refT,
      media.filter(!isDel(col("doc_id"))), 0L, nBuckets = 8)
    assert(serve(live) == serve(refT), "post-delete report diverged")
    val probe = media.filter(!isDel(col("doc_id")) &&
      pmod(col("doc_id"), lit(3)) === 2)
    assert(
      rowsOf(IncrementalMediaDedup.batchPairs(spark, live, probe)) ==
        rowsOf(IncrementalMediaDedup.batchPairs(spark, refT, probe)),
      "batchPairs diverged after erasure")
    IncrementalMediaDedup.compactBuckets(spark, live, minParts = 2)
    assert(serve(live) == serve(refT), "post-compaction report diverged")
    assert(spark.table(live)
      .join(delIdsOf(docs, "doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "compaction left tombstoned postings in the grid")
    IncrementalMediaDedup.applyBatch(spark, live,
      media.filter(isRe(col("doc_id"))), 3L, nBuckets = 8)
    val refT2 = "er_media_ref2"
    IncrementalMediaDedup.tables(refT2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalMediaDedup.applyBatch(spark, refT2,
      media.filter(!isDel(col("doc_id")) || isRe(col("doc_id"))), 0L,
      nBuckets = 8)
    assert(serve(live) == serve(refT2), "re-insertion report diverged")
  }

  test("spans: erasure repairs the _rep summary — spans repeated " +
      "only via deleted owners stop being cut") {
    val live = "er_spans"
    val refT = "er_spans_ref"
    (IncrementalSpans.tables(live) ++ IncrementalSpans.tables(refT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    def serve(t: String, req: DataFrame) =
      rowsOf(IncrementalSpans.removalView(spark, t, req))
    def report(t: String) = rowsOf(IncrementalSpans.spanReport(spark, t))
    Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
      IncrementalSpans.applyBatch(spark, live, dpart(p), b,
        nBuckets = 8)
    }
    // FULL compact first so the _rep summary exists and covers the
    // whole pre-delete corpus — the hard case the repair must fix
    IncrementalSpans.compact(spark, live)
    IncrementalSpans.deleteDocs(spark, live,
      docs.filter(isDel(col("doc_id"))))
    IncrementalSpans.applyBatch(spark, refT,
      docs.filter(!isDel(col("doc_id"))), 0L, nBuckets = 8)
    val req = docs.filter(!isDel(col("doc_id")))
    assert(report(live) == report(refT), "span report diverged")
    assert(serve(live, req) == serve(refT, req),
      "removalView diverged — the _rep summary repair is wrong")
    IncrementalSpans.compactBuckets(spark, live, minParts = 1)
    assert(report(live) == report(refT),
      "post-compaction span report diverged")
    // re-insert R
    IncrementalSpans.applyBatch(spark, live,
      docs.filter(isRe(col("doc_id"))), 3L, nBuckets = 8)
    val refT2 = "er_spans_ref2"
    IncrementalSpans.tables(refT2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalSpans.applyBatch(spark, refT2,
      docs.filter(!isDel(col("doc_id")) || isRe(col("doc_id"))), 0L,
      nBuckets = 8)
    val req2 = docs.filter(!isDel(col("doc_id")) || isRe(col("doc_id")))
    assert(report(live) == report(refT2),
      "re-insertion span report diverged")
    assert(serve(live, req2) == serve(refT2, req2),
      "re-insertion removalView diverged")
  }

  test("lsh dedup: erased docs stop colliding, re-arrival un-deletes, " +
      "vacuum physically reclaims") {
    val live = "er_lsh"
    val refT = "er_lsh_ref"
    Seq(live, IncrementalDedup.delsTable(live),
      s"${IncrementalDedup.delsTable(live)}_stage", refT)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalDedup.indexBatch(spark, live, dpart(0))
    IncrementalDedup.indexBatch(spark, live, dpart(1))
    IncrementalDedup.deleteDocs(spark, live, delIdsOf(docs, "doc_id"))
    // reference index over corpus-minus-D for batches 0..1
    IncrementalDedup.indexBatch(spark, refT,
      dpart(0).filter(!isDel(col("doc_id"))))
    IncrementalDedup.indexBatch(spark, refT,
      dpart(1).filter(!isDel(col("doc_id"))))
    // a fresh batch's candidates must match the reduced index's
    val probe = dpart(2).filter(!isDel(col("doc_id")))
    assert(rowsOf(IncrementalDedup.indexBatch(spark, live, probe)) ==
      rowsOf(IncrementalDedup.indexBatch(spark, refT, probe)),
      "candidates diverged after erasure")
    // un-delete on re-arrival: R's docs collide again, and the
    // returned pair set matches a reference that never erased them
    val reDocs = docs.filter(isRe(col("doc_id")))
    val livePairs = rowsOf(IncrementalDedup.indexBatch(spark, live,
      reDocs))
    val refPairs = rowsOf(IncrementalDedup.indexBatch(spark, refT,
      reDocs))
    assert(livePairs == refPairs,
      "re-arrival pairs diverged — un-delete is broken")
    assert(spark.table(IncrementalDedup.delsTable(live))
      .join(reDocs.select("doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "re-arrived docs were not un-deleted")
    // vacuum: rows physically gone, ledger cleared, serve unchanged
    IncrementalDedup.vacuum(spark, live)
    assert(!spark.catalog.tableExists(IncrementalDedup.delsTable(live)))
    val stillDel = docs.filter(isDel(col("doc_id")) &&
      !isRe(col("doc_id"))).select("doc_id")
    assert(spark.table(live)
      .join(stillDel, Seq("doc_id"), "left_semi").isEmpty,
      "vacuum left erased docs' band rows")
    assert(rowsOf(IncrementalDedup.indexBatch(spark, live, probe)) ==
      rowsOf(IncrementalDedup.indexBatch(spark, refT, probe)),
      "candidates diverged after vacuum")
  }

  test("knn graph: delete repairs owners' top-k AND thresholds — " +
      "continued ingest stays exactly one-shot") {
    val live = "er_knn"
    val refT = "er_knn_ref"
    (IncrementalKnnGraph.tables(live) ++
      IncrementalKnnGraph.tables(refT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    def part(lo: Long, hi: Long) =
      embs.filter(col("vec_id") >= lo && col("vec_id") < hi)
    def served(t: String) =
      rowsOf(IncrementalKnnGraph.graphView(spark, t))
    def oneShot(corpus: DataFrame) =
      rowsOf(SimilarityOps.knnGraph(corpus)
        .select("vec_id", "nbr_id", "rnk", "cos"))
    // D avoids the centroid seeds (vec_id < 8): the frozen-centroid
    // rule must keep matching the one-shot's vec_id < 8 seeding
    val delIds = embs
      .filter(col("vec_id") >= 8 && col("vec_id") % 5 === 3 &&
        col("vec_id") < 300)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    IncrementalKnnGraph.applyBatch(spark, live, part(0, 150), 0L)
    IncrementalKnnGraph.applyBatch(spark, live, part(150, 300), 1L)
    val removed =
      IncrementalKnnGraph.deleteVectors(spark, live, delIds)
    assert(removed == delIds.size)
    val reduced = embs.filter(!col("vec_id").isin(delIds: _*))
    assert(served(live) ==
      oneShot(reduced.filter(col("vec_id") < 300)),
      "post-delete graph diverged from the one-shot over " +
        "corpus-minus-deleted")
    // intent retired
    assert(!spark.catalog.tableExists(s"${live}_del_intent"))
    // idempotent re-delete
    assert(IncrementalKnnGraph.deleteVectors(spark, live, delIds) == 0L)
    // THE critical exactness property: continued ingest after the
    // delete — repaired (lowered) thresholds must admit the reverse
    // pairs the deletion re-opened
    IncrementalKnnGraph.applyBatch(spark, live,
      part(300, 1000000), 2L)
    assert(served(live) == oneShot(reduced),
      "post-delete ingest diverged — a stale (too high) threshold " +
        "rejected a reverse candidate")
    // compaction after erasure
    IncrementalKnnGraph.compactBuckets(spark, live, minParts = 2)
    assert(served(live) == oneShot(reduced))
    // re-insertion: deleted vectors re-ingested under a fresh batch
    val reIds = delIds.filter(_ % 2 == 0)
    IncrementalKnnGraph.applyBatch(spark, live,
      embs.filter(col("vec_id").isin(reIds: _*)), 3L)
    val corpus2 = embs.filter(!col("vec_id").isin(
      delIds.filterNot(reIds.contains): _*))
    assert(served(live) == oneShot(corpus2),
      "re-insertion diverged from the one-shot")
  }
}
