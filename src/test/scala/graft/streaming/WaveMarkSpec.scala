package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.WaveMark.FamilyVersion

/** Cross-index wave consistency: the wave-pinned serve REFUSES when
  * one family folded — or ERASED — ahead of the committed wave, while
  * the per-index serves silently expose the skew — the exact hazards
  * the marker exists to close. */
class WaveMarkSpec extends SparkSpec {

  private def docs =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("wave-pinned serve refuses on version skew; per-index serves " +
      "expose it") {
    val pT = "wv_postings"
    val wT = "wv_wave"
    (IncrementalBm25.tables(pT) ++ WaveMark.tables(wT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    def dpart(i: Int) =
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
    val terms = Seq("spark", "merge", "window")
    // wave 0: postings fold batch 0, second family (here represented
    // by its committed version alone) also at 0 — marker committed
    IncrementalBm25.applyBatch(spark, pT, dpart(0), 0L, nBuckets = 8)
    WaveMark.commitWave(spark, wT, 0L,
      Map("postings" -> FamilyVersion(0L, 0L),
        "other" -> FamilyVersion(0L, 0L)))
    def current(otherAt: Long) = Map(
      "postings" -> FamilyVersion(
        IncrementalBm25.committedBatch(spark, pT),
        AppendGrid.mutationEpoch(spark, pT)),
      "other" -> FamilyVersion(otherAt, 0L))
    assert(WaveMark.requireAtWave(spark, wT, current(0L)) == 0L)
    val servedAtWave0 =
      IncrementalBm25.queryView(spark, pT, terms).collect().toSeq
    // postings fold batch 1 — the wave is NOT committed yet (the
    // other family is paused): the pinned serve must refuse…
    IncrementalBm25.applyBatch(spark, pT, dpart(1), 1L, nBuckets = 8)
    val e = intercept[IllegalStateException] {
      WaveMark.requireAtWave(spark, wT, current(0L))
    }
    assert(e.getMessage.contains("postings at batch 1") &&
      e.getMessage.contains("pins batch 0"))
    // …while the per-index serve silently moved (the skew a fused
    // consumer would have read as one corpus)
    assert(IncrementalBm25.queryView(spark, pT, terms).collect().toSeq
      != servedAtWave0)
    // the other family catches up, the wave commits — consistent again
    WaveMark.commitWave(spark, wT, 1L,
      Map("postings" -> FamilyVersion(1L, 0L),
        "other" -> FamilyVersion(1L, 0L)))
    assert(WaveMark.requireAtWave(spark, wT, current(1L)) == 1L)
    // a family MISSING from the serve's map is also a refusal (a
    // fused serve must account for every pinned family)
    val e2 = intercept[IllegalStateException] {
      WaveMark.requireAtWave(spark, wT,
        Map("postings" -> FamilyVersion(1L, 0L)))
    }
    assert(e2.getMessage.contains("other missing"))
    // serving before any wave commit is a refusal, not a guess
    val e3 = intercept[IllegalStateException] {
      WaveMark.requireAtWave(spark, "wv_nowave",
        Map("x" -> FamilyVersion(0L, 0L)))
    }
    assert(e3.getMessage.contains("no committed wave"))
  }

  test("an erasure after the wave is a version skew: deletes mutate " +
      "a family without moving its watermark") {
    // continues on the previous test's state (postings at batch 1,
    // wave 1 committed at epoch 0). Erase one doc from the postings:
    // the fold watermark stays 1, but the served index changed — a
    // batch-id-only pin would silently serve a fusion mixing the
    // erased lexical corpus with the un-erased semantic one (the same
    // hazard class IncrementalPageRank closes for derived views).
    val pT = "wv_postings"
    val wT = "wv_wave"
    val victim = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .limit(1)
    assert(IncrementalBm25.deleteDocs(spark, pT, victim) == 1L)
    def current() = Map(
      "postings" -> FamilyVersion(
        IncrementalBm25.committedBatch(spark, pT),
        AppendGrid.mutationEpoch(spark, pT)),
      "other" -> FamilyVersion(1L, 0L))
    assert(AppendGrid.mutationEpoch(spark, pT) == 1L)
    val e = intercept[IllegalStateException] {
      WaveMark.requireAtWave(spark, wT, current())
    }
    assert(e.getMessage.contains("epoch 1") &&
      e.getMessage.contains("pins batch 1 epoch 0") &&
      e.getMessage.contains("ERASURE"))
    // the pipeline acknowledges the erasure by re-committing the wave
    // over the erased state — consistent again
    WaveMark.commitWave(spark, wT, 2L, current())
    assert(WaveMark.requireAtWave(spark, wT, current()) == 2L)
    // idempotent re-delete leaves the epoch (ledger rows) unchanged —
    // no spurious skew
    assert(IncrementalBm25.deleteDocs(spark, pT, victim) == 0L)
    assert(WaveMark.requireAtWave(spark, wT, current()) == 2L)
  }
}
