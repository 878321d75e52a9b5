package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MultimodalOps

/** Maintained frame near-dup index: report == one-shot mm07 through
  * redelivery + compaction; batchPairs == report restricted to the
  * batch; read-time df absorbs erasure exactly. */
class IncrementalFrameDedupSpec extends SparkSpec {

  private val table = "ifd_frames"

  private def media: DataFrame =
    MultimodalOps.toMediaColumns(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"))

  private def part(i: Int) =
    media.filter(pmod(col("doc_id"), lit(3)) === i)

  private def rowsOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_a", "doc_b", "n_match").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def oneShot(m: DataFrame) =
    rowsOf(MultimodalOps.frameNearDups(m))

  test("report == one-shot mm07 through redelivery + compaction; " +
      "batchPairs == report restricted to the batch") {
    IncrementalFrameDedup.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
      IncrementalFrameDedup.applyBatch(spark, table, part(p), b,
        nBuckets = 8)
    }
    val compacted =
      IncrementalFrameDedup.compactBuckets(spark, table, minParts = 2)
    assert(compacted.nonEmpty)
    IncrementalFrameDedup.applyBatch(spark, table, part(2), 2L,
      nBuckets = 8)
    val report = rowsOf(IncrementalFrameDedup.report(spark, table))
    assert(report == oneShot(media),
      "maintained report diverged from the one-shot mm07")
    // per-batch serve: pairs involving batch 2 == report restricted
    val batchIds = part(2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val got = rowsOf(
      IncrementalFrameDedup.batchPairs(spark, table, part(2)))
    val expected = report.filter(p =>
      batchIds(p._1) || batchIds(p._2))
    assert(got == expected, "batchPairs diverged from the report")
  }

  test("read-time df absorbs erasure: delete → one-shot over the " +
      "reduced corpus; re-insert → one-shot over the full corpus") {
    val del = media.filter(pmod(col("doc_id"), lit(7)) === 3)
    IncrementalFrameDedup.deleteDocs(spark, table,
      del.select("doc_id"))
    val reduced = media.filter(pmod(col("doc_id"), lit(7)) =!= 3)
    assert(rowsOf(IncrementalFrameDedup.report(spark, table)) ==
      oneShot(reduced),
      "post-delete report diverged (df must be recounted live)")
    // compaction physically reclaims under the ledger
    IncrementalFrameDedup.compactBuckets(spark, table, minParts = 1)
    assert(spark.table(table)
      .join(del.select("doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "compaction left tombstoned postings")
    assert(rowsOf(IncrementalFrameDedup.report(spark, table)) ==
      oneShot(reduced))
    // re-insertion cancels the delete exactly — including the df
    // recount flipping fingerprints back over/under the cap
    IncrementalFrameDedup.applyBatch(spark, table, del, 3L,
      nBuckets = 8)
    assert(rowsOf(IncrementalFrameDedup.report(spark, table)) ==
      oneShot(media), "re-insertion did not cancel the delete")
  }

  test("frame parameter drift fails fast") {
    intercept[IllegalArgumentException] {
      IncrementalFrameDedup.applyBatch(spark, table, part(0), 9L,
        nBuckets = 8, frameBytes = 32)
    }
    intercept[IllegalArgumentException] {
      IncrementalFrameDedup.batchPairs(spark, table, part(0),
        frameBytes = 32)
    }
  }
}
