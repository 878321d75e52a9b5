package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** IncrementalSpans: batched fold == one-shot span-level report;
  * replay is a no-op (pure upserts, no watermark); a trickle doc
  * rewrites only its spans' buckets. */
class IncrementalSpansSpec extends SparkSpec {

  private val table = "spanspec_grid"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage")
      .foreach(CdcMerge.dropStateTable(spark, _))

  // groups of 4 docs share an 8-token template plus unique filler
  private def docs = {
    import spark.implicits._
    (0L until 24L).map { i =>
      val g = i % 6
      val filler = (0 until 6).map(j => s"u${i}_$j").mkString(" ")
      val tmpl = (0 until 8).map(j => s"g${g}_$j").mkString(" ")
      (i, s"$filler $tmpl")
    }.toDF("doc_id", "text")
  }

  private def oneShot = DedupOps.repeatedSpans(docs, spanLen = 8)
    .groupBy("span_key")
    .agg(max("n_docs").as("n_docs"), max("n_occ").as("n_occ"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .toSet

  private def report() = IncrementalSpans.spanReport(spark, table)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .toSet

  test("batched fold == one-shot span report; replay no-op") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalSpans.applyBatch(spark, table, part(i)))
    val before = report()
    assert(before == oneShot && before.nonEmpty)
    // redeliver batch 1 verbatim: identical rows upsert over
    // themselves — no watermark needed
    IncrementalSpans.applyBatch(spark, table, part(1))
    assert(report() == before)
  }

  test("a trickle doc rewrites only its spans' buckets") {
    import spark.implicits._
    freshTable()
    IncrementalSpans.applyBatch(spark, table, docs, nBuckets = 16)
    val filesBefore = spark.table(table).inputFiles.toSet
    // one new doc whose spans are all fresh (single span window)
    val trickle = Seq((100L,
      (0 until 8).map(j => s"z_$j").mkString(" ")))
      .toDF("doc_id", "text")
    IncrementalSpans.applyBatch(spark, table, trickle, nBuckets = 16)
    val filesAfter = spark.table(table).inputFiles.toSet
    val untouched = filesBefore.intersect(filesAfter)
    assert(untouched.size >= filesBefore.size - 1,
      s"expected <=1 bucket rewritten, kept ${untouched.size} of " +
        s"${filesBefore.size}")
  }
}
