package graft.streaming

import graft.SparkSpec
import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** IncrementalSample (mergeable bottom-k fold): batched fold ==
  * one-shot prioritySample bit-for-bit; later batches DISPLACE
  * earlier picks; replay is a no-op (watermark) and stays idempotent
  * even when the watermark is lost (bottom-k re-merge); state never
  * exceeds k rows. */
class IncrementalSampleSpec extends SparkSpec {

  private val table = "samplespec_state"

  private def freshTable(): Unit =
    IncrementalSample.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // token counts spread 1..48 so weights (and priorities) differ a lot
  private def docs = {
    import spark.implicits._
    (0L until 24L).map { i =>
      val n = 1 + (i.toInt * 2) % 48
      (i, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def oneShot(k: Int) = rows(CurationOps.prioritySample(docs, k))

  test("batched fold == one-shot bottom-k; replay no-op; crash-" +
      "window replay idempotent") {
    import spark.implicits._
    freshTable()
    val k = 6 // < docs per batch, so every fold must displace
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSample.applyBatch(spark, table, part(i),
        batchId = i, k = k))
    val got = rows(IncrementalSample.sample(spark, table))
    assert(got == oneShot(k) && got.size == k)
    // clean replay: watermark short-circuits before any job
    IncrementalSample.applyBatch(spark, table, part(1), batchId = 1,
      k = k)
    assert(rows(IncrementalSample.sample(spark, table)) == got)
    // CRASH-WINDOW replay: watermark lost — the fold re-runs, and the
    // bottom-k merge of already-sampled rows must change nothing
    Seq(s"${table}_wm", s"${table}_wm_stage", s"${table}_wm_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalSample.applyBatch(spark, table, part(1), batchId = 1,
      k = k)
    assert(rows(IncrementalSample.sample(spark, table)) == got)
  }

  test("state is bounded by k after every fold and later batches " +
      "displace earlier picks") {
    import spark.implicits._
    freshTable()
    val k = 3
    // batch 0: light docs (small w → LARGE priority); batch 1: heavy
    // docs that must take over the whole sample
    val light = (0L until 6L)
      .map(i => (i, s"a$i")).toDF("doc_id", "text")
    val heavy = (100L until 106L)
      .map(i => (i, (0 until 200).map(j => s"h${i}_$j")
        .mkString(" "))).toDF("doc_id", "text")
    IncrementalSample.applyBatch(spark, table, light, batchId = 0,
      k = k)
    assert(IncrementalSample.sample(spark, table).count() == k)
    val first = rows(IncrementalSample.sample(spark, table))
    IncrementalSample.applyBatch(spark, table, heavy, batchId = 1,
      k = k)
    val second = rows(IncrementalSample.sample(spark, table))
    assert(second.size == k)
    assert(second == rows(
      CurationOps.prioritySample(light.unionByName(heavy), k)))
    // the heavy batch's docs dominate the weight-tilted sample iff
    // their priorities are smaller — pin at least one displacement
    assert(first != second)
  }

  test("k drift fails fast (a larger k cannot be served from a " +
      "smaller-k state) — even when the watermark was lost") {
    import spark.implicits._
    freshTable()
    IncrementalSample.applyBatch(spark, table, docs, batchId = 0,
      k = 4)
    val e = intercept[IllegalArgumentException] {
      IncrementalSample.applyBatch(spark, table, docs, batchId = 1,
        k = 8)
    }
    assert(e.getMessage.contains("k is fixed"))
    // the first-fold crash window: state written, watermark never —
    // the guard must fire off the state's _k column instead
    Seq(s"${table}_wm", s"${table}_wm_stage", s"${table}_wm_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalSample.applyBatch(spark, table, docs, batchId = 1,
        k = 8)
    }
    assert(e2.getMessage.contains("k is fixed"))
  }
}
