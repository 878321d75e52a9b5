package graft.streaming

import graft.SparkSpec
import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** IncrementalDsir: batched bucket maintenance equals one-shot
  * dsirWeights; replays are watermark no-ops; ratios serve any doc
  * set. */
class IncrementalDsirSpec extends SparkSpec {

  private val table = "dsirspec_buckets"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def corpus = {
    import spark.implicits._
    (0L until 30L).map { i =>
      val src = if (i % 3 == 0) "tgt" else "bg"
      (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 5} u$i", src)
    }.toDF("doc_id", "text", "source")
  }

  test("three disjoint batches == one-shot dsirWeights; replay no-op") {
    import spark.implicits._
    freshTable()
    val docs = corpus
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    IncrementalDsir.applyBatch(spark, table, part(0), "tgt", 0L)
    IncrementalDsir.applyBatch(spark, table, part(1), "tgt", 1L)
    // redelivery of batch 1 under its original id: must change nothing
    val before = TableSwap.readVersioned(spark, table)
      .collect().toSet
    IncrementalDsir.applyBatch(spark, table, part(1), "tgt", 1L)
    assert(TableSwap.readVersioned(spark, table)
      .collect().toSet == before)
    IncrementalDsir.applyBatch(spark, table, part(2), "tgt", 2L)

    val inc = IncrementalDsir.weightsFor(spark, table, docs)
      .orderBy($"doc_id").collect().toSeq
    val oneShot = CurationOps.dsirWeights(docs, "tgt")
      .orderBy($"doc_id").collect().toSeq
    assert(inc == oneShot)
  }

  test("state stays <= nBuckets rows — the TableSwap size bound") {
    import spark.implicits._
    freshTable()
    val docs = corpus
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDsir.applyBatch(spark, table, part(i), "tgt", i.toLong,
        buckets = 16))
    // the SERVED version stays <= nBuckets rows; physical history
    // is bounded by appendVersioned's 64-file fold-down
    assert(TableSwap.readVersioned(spark, table).count() <= 16L)
    freshTable()
  }

  test("maintained counts equal the one-shot bucket aggregation") {
    import spark.implicits._
    freshTable()
    val docs = corpus
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDsir.applyBatch(spark, table, part(i), "tgt", i.toLong))
    val maintained = TableSwap.readVersioned(spark, table)
      .select($"bucket", $"corpus_cnt", $"target_cnt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val oneShot = CurationOps.dsirShingles(docs, 64)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("c"),
        sum(($"source" === "tgt").cast("long")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(maintained == oneShot)
  }

  test("startIngestStream: streamed batches equal one-shot weights") {
    import spark.implicits._
    freshTable()
    val docs = corpus
    val src = tmpDir("dsir-src")
    docs.filter($"doc_id" < 15).coalesce(1).write.parquet(s"$src/f1")
    docs.filter($"doc_id" >= 15).coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = IncrementalDsir.startIngestStream(stream, table, "tgt",
      tmpDir("dsir-ck"))
    try q.awaitTermination() finally q.stop()
    val inc = IncrementalDsir.weightsFor(spark, table, docs)
      .orderBy($"doc_id").collect().toSeq
    val oneShot = CurationOps.dsirWeights(docs, "tgt")
      .orderBy($"doc_id").collect().toSeq
    assert(inc == oneShot)
  }

  test("weightsFor scores an unseen candidate batch against current ratios") {
    import spark.implicits._
    freshTable()
    IncrementalDsir.applyBatch(spark, table, corpus, "tgt", 0L)
    // candidates share the target vocabulary -> nonzero weights from
    // the MAINTAINED ratios without re-profiling the corpus
    val cands = Seq((100L, "w0 w1 w2"), (101L, "zz zq zx"))
      .toDF("doc_id", "text")
    val w = IncrementalDsir.weightsFor(spark, table, cands)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("weight")).toMap
    assert(w(100L) > 0L)
    // an all-novel doc hits empty/unseen buckets only if its shingle
    // hashes collide; either way it is scored (possibly zero rows if
    // no bucket exists) without error
    assert(w.contains(100L))
  }
}
