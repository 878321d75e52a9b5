package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalContainment (append-shaped inverted index, serve-time
  * df): report == one-shot containmentPairs after batched ingest;
  * batchPairs finds the LATE-ARRIVING near-superset a batch-local
  * one-shot structurally misses, and equals the report restricted to
  * batch-involving pairs; bucket compaction preserves everything;
  * shingleW drift fails fast. */
class IncrementalContainmentSpec extends SparkSpec {

  private val table = "containspec_idx"

  private def freshTable(): Unit =
    IncrementalContainment.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // doc 0 ⊂ doc 1 (same batch), doc 2 ⊂ doc 10 (doc 10 arrives LATE),
  // doc 11 ⊂ doc 3 (late doc contained in an EARLY doc), fillers
  private def mk(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private val core = (0 until 8).map(j => s"a_$j").mkString(" ")
  private val quote = (0 until 8).map(j => s"q_$j").mkString(" ")
  private val host = (0 until 8).map(j => s"h_$j").mkString(" ")
  private def early = mk(
    (0L, core),
    (1L, s"$core x_1 x_2"),
    (2L, quote),
    (3L, s"$host w_1 w_2"),
    (4L, (0 until 10).map(j => s"f4_$j").mkString(" ")),
    (5L, (0 until 10).map(j => s"f5_$j").mkString(" ")))
  private def late = mk(
    (10L, s"$quote y_1 y_2"), // late near-superset of early doc 2
    (11L, host),              // late doc contained in early doc 3
    (12L, (0 until 10).map(j => s"f12_$j").mkString(" ")))
  private def all = early.unionByName(late)

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("report == one-shot containmentPairs through batched ingest, " +
      "a redelivered batch, and mid-stream bucket compaction") {
    freshTable()
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0,
      nBuckets = 8)
    // redelivery (watermark no-op)
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0,
      nBuckets = 8)
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1,
      nBuckets = 8)
    val oneShot = rows(DedupOps.containmentPairs(all))
    assert(rows(IncrementalContainment.report(spark, table)) == oneShot)
    assert(oneShot.exists(p => p._1 == 0L && p._2 == 1L))
    // crash-window replay: batch 1 on disk, watermark rewound
    import spark.implicits._
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${table}_wm")
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1,
      nBuckets = 8)
    assert(rows(IncrementalContainment.report(spark, table)) == oneShot)
    // bucket compaction: the serve reads through the compacted layout
    val compacted = IncrementalContainment.compactBuckets(spark, table,
      minParts = 2)
    assert(compacted.nonEmpty)
    assert(rows(IncrementalContainment.report(spark, table)) == oneShot)
  }

  test("batchPairs: the late-arriving near-superset is FOUND against " +
      "history (both directions), equals the report restricted to " +
      "batch-involving pairs, and a batch-local one-shot misses it") {
    freshTable()
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0)
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1)
    val full = rows(IncrementalContainment.report(spark, table))
    val batchIds = Set(10L, 11L, 12L)
    val expected = full.filter(p =>
      batchIds(p._1) || batchIds(p._2))
    val got = rows(IncrementalContainment.batchPairs(spark, table,
      late))
    assert(got == expected && got.nonEmpty)
    // the two cross-boundary directions specifically:
    // early doc 2 contained in LATE doc 10 (history-side doc_a)...
    assert(got.exists(p => p._1 == 2L && p._2 == 10L))
    // ...and late doc 11 contained in EARLY doc 3 (batch-side doc_a)
    assert(got.exists(p => p._1 == 11L && p._2 == 3L))
    // within-batch pairs must NOT leak old-old pairs: (0 ⊂ 1) is
    // history-only and absent
    assert(!got.exists(p => p._1 == 0L && p._2 == 1L))
    // the motivating wrongness: a batch-local one-shot sees neither
    // cross-boundary pair
    val local = rows(DedupOps.containmentPairs(late))
    assert(!local.exists(p => p._1 == 2L || p._2 == 3L))
  }

  test("batchPairs candidate restriction is ∝ batch: the candidate " +
      "doc set is the batch + docs sharing a kept shingle with it, " +
      "not the corpus") {
    freshTable()
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0)
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1)
    // fillers 4, 5 share no shingle with the late batch: no pair in
    // the serve may touch them, though the corpus-wide report is free
    // to pair them with whatever contains them
    val got = rows(IncrementalContainment.batchPairs(spark, table,
      late))
    assert(!got.exists(p => Set(4L, 5L)(p._1) || Set(4L, 5L)(p._2)))
    // and the pinned candidate-volume bound: owners of the batch's
    // kept shingles + the batch itself = docs 2, 3 + (10, 11, 12)
    val grid = spark.table(table).select("shingle", "doc_id")
    val batchKeys = DedupOps.docWordGrams(late, 3)
      .select("shingle").distinct()
    val owners = grid.join(batchKeys, Seq("shingle"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(owners == Set(2L, 3L, 10L, 11L, 12L))
  }

  test("the forward/inverted twins serve ONE snapshot: an open crash " +
      "window (generations written, shared watermark not) is invisible " +
      "to batchPairs and report; the replay re-commits both") {
    import spark.implicits._
    freshTable()
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0)
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1)
    assert(spark.catalog.tableExists(s"${table}_fwd"))
    val got = rows(IncrementalContainment.batchPairs(spark, table,
      late))
    assert(got.exists(p => p._1 == 2L && p._2 == 10L))
    // reopen batch 1's crash window: both twins hold _b=1 on disk but
    // the shared watermark is rewound — every serve sees the
    // pre-batch state on BOTH grids (no torn candidate/verify split)
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${table}_wm")
    val pre = rows(IncrementalContainment.batchPairs(spark, table,
      late))
    assert(pre.isEmpty) // late docs not committed: no history pairs
    assert(!rows(IncrementalContainment.report(spark, table))
      .exists(p => p._1 == 2L && p._2 == 10L))
    // re-deliver: both generations overwritten, watermark advances
    IncrementalContainment.applyBatch(spark, table, late, batchId = 1)
    assert(rows(IncrementalContainment.batchPairs(spark, table,
      late)) == got)
  }

  test("shingleW drift fails fast on fold and serve") {
    freshTable()
    IncrementalContainment.applyBatch(spark, table, early, batchId = 0,
      shingleW = 3)
    val e = intercept[IllegalArgumentException] {
      IncrementalContainment.applyBatch(spark, table, late,
        batchId = 1, shingleW = 4)
    }
    assert(e.getMessage.contains("shingleW"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalContainment.batchPairs(spark, table, late,
        shingleW = 4)
    }
    assert(e2.getMessage.contains("shingleW"))
  }
}
