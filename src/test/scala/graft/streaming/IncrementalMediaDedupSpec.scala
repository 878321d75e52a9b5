package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MultimodalOps

/** Maintained media near-dup index: report == one-shot mm06 through
  * batched ingest, redelivery, mid-stream compaction; batch-vs-corpus
  * serving; crash-window snapshot consistency. */
class IncrementalMediaDedupSpec extends SparkSpec {

  private val table = "mdd_state"

  private def fresh(): Unit =
    IncrementalMediaDedup.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // sf0.001 documents as media, plus planted payloads (an exact copy
  // and a one-char variant) so the pair set is provably non-empty
  private def media: DataFrame = {
    import spark.implicits._
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val planted = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog", "synth"),
      (9002L, "the quick brown fox jumps over the lazy dog", "synth"),
      (9003L, "the quick brown fox jumps over the lazy dot", "synth"))
      .toDF("doc_id", "text", "source")
    MultimodalOps.toMediaColumns(docs.unionByName(planted))
  }

  private def part(i: Int): DataFrame =
    media.filter(pmod(col("doc_id"), lit(3)) === i)

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def oneShot = pairs(MultimodalOps.mediaNearDups(media))

  test("report == one-shot mm06 through batched ingest, a redelivered " +
      "batch, mid-stream bucket compaction; crash window invisible") {
    fresh()
    IncrementalMediaDedup.applyBatch(spark, table, part(0), 0L,
      nBuckets = 8)
    IncrementalMediaDedup.applyBatch(spark, table, part(1), 1L,
      nBuckets = 8)
    // redelivery under the committed watermark: a full no-op
    val files = spark.table(table).inputFiles.toSet
    IncrementalMediaDedup.applyBatch(spark, table, part(1), 1L,
      nBuckets = 8)
    assert(spark.table(table).inputFiles.toSet == files,
      "a redelivered committed batch rewrote grid files")
    // mid-stream incremental compaction, then a crash window: the
    // next generation lands but its watermark is withheld — the
    // served report must show the pre-batch state
    assert(IncrementalMediaDedup
      .compactBuckets(spark, table, minParts = 2).nonEmpty)
    val before = pairs(IncrementalMediaDedup.report(spark, table))
    val crashGen = MultimodalOps.bandedPhash(part(2))
      .withColumn("_kb",
        pmod(xxhash64(col("band"), col("key")), lit(8L)))
    AppendGrid.writeGeneration(spark, table, crashGen, 2L,
      Seq("band", "key", "doc_id", "phash"))
    assert(pairs(IncrementalMediaDedup.report(spark, table)) == before,
      "an uncommitted generation leaked into the served report")
    // the redelivered fold closes the window (same generation,
    // overwritten idempotently, watermark advances)
    IncrementalMediaDedup.applyBatch(spark, table, part(2), 2L,
      nBuckets = 8)
    val served = pairs(IncrementalMediaDedup.report(spark, table))
    assert(served == oneShot)
    assert(served.contains((9001L, 9002L, 0L)),
      "the planted exact-dup pair is missing")
    // pair set strictly grew across the corpus (sanity: the planted
    // variant pair is cross-batch: 9001%3 != 9003%3)
    assert((9001L % 3) != (9003L % 3))
  }

  test("batchPairs: batch-vs-corpus discovery equals the report " +
      "restricted to batch-involving pairs") {
    // state from the previous test's full build (report == one-shot)
    val batchIds = part(1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val got = pairs(
      IncrementalMediaDedup.batchPairs(spark, table, part(1)))
    val expected = pairs(IncrementalMediaDedup.report(spark, table))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == expected)
    assert(got.nonEmpty, "no cross-batch pair to pin — weak fixture")
  }

  test("pHash parameter drift fails fast") {
    intercept[IllegalArgumentException] {
      IncrementalMediaDedup.applyBatch(spark, table, part(0), 9L,
        nBuckets = 8, gram = 5)
    }
  }
}
