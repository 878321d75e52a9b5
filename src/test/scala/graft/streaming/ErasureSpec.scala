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
    // vacuum: rows physically gone, serve unchanged — and the ledger
    // KEPT: the accumulated pair log (the doc25 union-of-batches
    // shape) still names erased docs, and minusDeletedPairs subtracts
    // through the ledger — clearing it at vacuum would silently
    // resurface those pairs (the r16 review)
    IncrementalDedup.vacuum(spark, live)
    assert(spark.catalog.tableExists(IncrementalDedup.delsTable(live)),
      "vacuum must keep the ledger — the pair log depends on it")
    val stillDel = docs.filter(isDel(col("doc_id")) &&
      !isRe(col("doc_id"))).select("doc_id")
    assert(spark.table(live)
      .join(stillDel, Seq("doc_id"), "left_semi").isEmpty,
      "vacuum left erased docs' band rows")
    assert(rowsOf(IncrementalDedup.indexBatch(spark, live, probe)) ==
      rowsOf(IncrementalDedup.indexBatch(spark, refT, probe)),
      "candidates diverged after vacuum")
    // a pair log naming a still-erased doc keeps filtering it after
    // the vacuum; pairs between live docs pass through
    import spark.implicits._
    val delId = stillDel.limit(1).collect()(0).getLong(0)
    val log = Seq((delId, 999999999L), (999999998L, 999999999L))
      .toDF("doc_a", "doc_b")
    assert(IncrementalDedup.minusDeletedPairs(spark, live, log)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((999999998L, 999999999L)),
      "post-vacuum pair log stopped filtering erased docs")
    // the vacuumed index keeps its ORIGINAL bucket layout: the
    // rewrite reads the count from the catalog, never a caller
    // default (a mismatch would rebucket and break later appends)
    val bucketsAfter = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier(live))
      .bucketSpec.map(_.numBuckets)
    assert(bucketsAfter.contains(8),
      s"vacuum changed the bucket layout: $bucketsAfter")
    // and appends still work on the vacuumed table
    assert(rowsOf(IncrementalDedup.indexBatch(spark, live, reDocs)) ==
      refPairs, "post-vacuum append diverged")
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

  test("knn graph: delete AFTER bucket compaction — repair rows stay " +
      "visible and survive the next compaction") {
    // the r16 review's shadowing hazard: with every bucket's compacted
    // coverage AT the watermark, repair rows stamped at a positive
    // _b <= coverage would be invisible to resolved() and dropped as
    // leftovers by the next compaction — they must land INSIDE the
    // covering compacted partition instead
    val live = "er_knn_cov"
    IncrementalKnnGraph.tables(live)
      .foreach(CdcMerge.dropStateTable(spark, _))
    def part(lo: Long, hi: Long) =
      embs.filter(col("vec_id") >= lo && col("vec_id") < hi)
    def served = rowsOf(IncrementalKnnGraph.graphView(spark, live))
    def oneShot(corpus: DataFrame) =
      rowsOf(SimilarityOps.knnGraph(corpus)
        .select("vec_id", "nbr_id", "rnk", "cos"))
    IncrementalKnnGraph.applyBatch(spark, live, part(0, 150), 0L)
    IncrementalKnnGraph.applyBatch(spark, live, part(150, 300), 1L)
    // minParts=1 folds EVERY bucket: coverage == watermark everywhere
    assert(IncrementalKnnGraph.compactBuckets(spark, live,
      minParts = 1).nonEmpty)
    val delIds = embs
      .filter(col("vec_id") >= 8 && col("vec_id") % 5 === 3 &&
        col("vec_id") < 300)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(IncrementalKnnGraph.deleteVectors(spark, live, delIds) ==
      delIds.size)
    val reduced = embs.filter(!col("vec_id").isin(delIds: _*))
    assert(served == oneShot(reduced.filter(col("vec_id") < 300)),
      "repair rows written after a coverage-at-watermark compaction " +
        "are not serving")
    // the NEXT compaction must keep them (pre-fix it dropped the
    // wrongly-stamped partition as an already-shadowed leftover)
    IncrementalKnnGraph.compactBuckets(spark, live, minParts = 1)
    assert(served == oneShot(reduced.filter(col("vec_id") < 300)),
      "compaction after the delete lost the repair rows")
    // continued ingest on top stays exact
    IncrementalKnnGraph.applyBatch(spark, live, part(300, 1000000), 2L)
    assert(served == oneShot(reduced),
      "post-delete ingest on the compacted layout diverged")
  }

  test("knn graph: a second, threshold-lowering delete cannot " +
      "resurrect stragglers pointing at earlier-deleted vectors") {
    // the r16 review's erasure leak: a grid row (x, d) admitted under
    // an old low threshold and since outranked fails the owner test
    // when d is deleted, physically survives outside the rewritten
    // buckets — and a LATER delete of something in x's top-k lowers
    // x's k-th below cos(x, d). The tombstone ledger must keep it out
    // of every serve, and compaction must physically reclaim it.
    val live = "er_knn_seq"
    IncrementalKnnGraph.tables(live)
      .foreach(CdcMerge.dropStateTable(spark, _))
    def part(lo: Long, hi: Long) =
      embs.filter(col("vec_id") >= lo && col("vec_id") < hi)
    def served = rowsOf(IncrementalKnnGraph.graphView(spark, live))
    def oneShot(corpus: DataFrame) =
      rowsOf(SimilarityOps.knnGraph(corpus)
        .select("vec_id", "nbr_id", "rnk", "cos"))
    IncrementalKnnGraph.applyBatch(spark, live, part(0, 150), 0L)
    IncrementalKnnGraph.applyBatch(spark, live, part(150, 300), 1L)
    val del1 = embs
      .filter(col("vec_id") >= 8 && col("vec_id") % 7 === 2 &&
        col("vec_id") < 300)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    IncrementalKnnGraph.deleteVectors(spark, live, del1)
    val corpus1 = part(0, 300).filter(!col("vec_id").isin(del1: _*))
    assert(served == oneShot(corpus1))
    // wave 2: the RANK-1 neighbors of many survivors — deletions
    // guaranteed to lower their owners' k-th cosines
    val del2 = SimilarityOps.knnGraph(corpus1)
      .filter(col("rnk") === 1 && col("nbr_id") >= 8 &&
        col("vec_id") < 100)
      .select("nbr_id").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted.take(12)
    assert(del2.nonEmpty)
    IncrementalKnnGraph.deleteVectors(spark, live, del2)
    val deleted = (del1 ++ del2).toSet
    val corpus2 = part(0, 300)
      .filter(!col("vec_id").isin(deleted.toSeq: _*))
    assert(served == oneShot(corpus2),
      "the second delete resurrected a straggler edge to an " +
        "earlier-deleted vector (or missed a repair)")
    // compaction physically reclaims every straggler on both endpoints
    IncrementalKnnGraph.compactBuckets(spark, live, minParts = 1)
    assert(served == oneShot(corpus2),
      "compaction changed the served graph after sequential deletes")
    val raw = spark.table(live)
    assert(raw.filter(col("vec_id").isin(deleted.toSeq: _*) ||
      col("nbr_id").isin(deleted.toSeq: _*)).isEmpty,
      "compaction left physically-present rows naming deleted vectors")
  }

  test("knn graph: deleting EVERY prober of a cell drops the drained " +
      "probes partition — later folds there serve no deleted-owned " +
      "rows") {
    // the r16 optimization-round find: the probes rewrite is a
    // dynamic overwrite, which skips partitions absent from its data
    // — a cell whose probers are ALL deleted kept their probe rows,
    // and a later batch landing in that cell read them as reverse
    // probers, appending pairs OWNED by deleted vectors at _b > _db
    // (past the tombstones). Synthetic two-cell corpus so the drained
    // cell is constructed exactly.
    import spark.implicits._
    val live = "er_knn_drain"
    IncrementalKnnGraph.tables(live)
      .foreach(CdcMerge.dropStateTable(spark, _))
    def vecs(rows: (Long, Seq[Float])*): DataFrame =
      rows.toDF("vec_id", "embedding")
    def fold(b: Long, rows: (Long, Seq[Float])*): Unit =
      IncrementalKnnGraph.applyBatch(spark, live, vecs(rows: _*), b,
        nBuckets = 4, dim = 4, nCentroids = 2, nProbe = 1, k = 2)
    // centroids freeze as vec 0 (e0) and vec 1 (e1); nProbe=1 makes
    // cell membership == prober set, so the drained cell is exact
    fold(0L, 0L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Seq(0.0f, 1.0f, 0.0f, 0.0f))
    fold(1L, 2L -> Seq(0.9f, 0.1f, 0.0f, 0.0f),
      3L -> Seq(0.8f, 0.2f, 0.0f, 0.0f),
      4L -> Seq(0.1f, 0.9f, 0.0f, 0.0f),
      5L -> Seq(0.2f, 0.8f, 0.0f, 0.0f))
    // delete cell 0 whole (vec 0 is a centroid seed — its frozen
    // centroid role persists, its corpus membership goes)
    IncrementalKnnGraph.deleteVectors(spark, live, Seq(0L, 2L, 3L))
    val probes = spark.table(s"${live}_probes")
    assert(probes.filter(col("vec_id").isin(0L, 2L, 3L)).isEmpty,
      "drained cell kept its deleted probers' probe rows")
    // a later batch lands in the drained cell: reverse repair must
    // see no deleted probers
    fold(2L, 6L -> Seq(0.95f, 0.05f, 0.0f, 0.0f),
      7L -> Seq(0.85f, 0.15f, 0.0f, 0.0f))
    val g = IncrementalKnnGraph.graphView(spark, live, k = 2)
    assert(g.filter(col("vec_id").isin(0L, 2L, 3L) ||
      col("nbr_id").isin(0L, 2L, 3L)).isEmpty,
      "a fold after the delete served rows naming deleted vectors — " +
        "the drained probes partition leaked")
    // the surviving graph is still exact: 6 and 7 are each other's
    // only cell-0 neighbors
    val nbrs = g.filter(col("vec_id") === 6L).select("nbr_id")
      .collect().map(_.getLong(0)).toSet
    assert(nbrs == Set(7L), s"vec 6 neighbors $nbrs != {7}")
  }

  test("erasure fences on an open crash window: tombstones cannot " +
      "land below an uncommitted generation") {
    // a fold's rows land but its watermark doesn't (crash window);
    // a tombstone at _db = old watermark would NOT cover the replay
    // (it re-commits above _db) — deleteDocs must refuse until the
    // batch is re-delivered (the r16 review; deleteVectors already
    // fenced)
    val live = "er_fence"
    IncrementalMediaDedup.tables(live)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val media = MultimodalOps.toMediaColumns(docs)
    IncrementalMediaDedup.applyBatch(spark, live,
      media.filter(pmod(col("doc_id"), lit(3)) === 0), 0L,
      nBuckets = 8)
    IncrementalMediaDedup.applyBatch(spark, live,
      media.filter(pmod(col("doc_id"), lit(3)) === 1), 1L,
      nBuckets = 8)
    // re-open batch 1's crash window by rewinding the watermark
    import spark.implicits._
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${live}_wm")
    val e = intercept[IllegalArgumentException] {
      IncrementalMediaDedup.deleteDocs(spark, live,
        delIdsOf(docs, "doc_id"))
    }
    assert(e.getMessage.contains("uncommitted generation"))
    // re-delivering the batch closes the window; the delete then runs
    IncrementalMediaDedup.applyBatch(spark, live,
      media.filter(pmod(col("doc_id"), lit(3)) === 1), 1L,
      nBuckets = 8)
    IncrementalMediaDedup.deleteDocs(spark, live,
      delIdsOf(docs, "doc_id"))
    val refT = "er_fence_ref"
    IncrementalMediaDedup.tables(refT)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalMediaDedup.applyBatch(spark, refT,
      media.filter(pmod(col("doc_id"), lit(3)) =!= 2 &&
        !isDel(col("doc_id"))), 0L, nBuckets = 8)
    assert(rowsOf(IncrementalMediaDedup.report(spark, live)) ==
      rowsOf(IncrementalMediaDedup.report(spark, refT)),
      "post-fence delete diverged")
  }
}
