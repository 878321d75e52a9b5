package graft.streaming

import graft.SparkSpec
import graft.operators.DedupOps

/** Incremental LSH indexing: batch-wise candidate coverage equals the
  * one-shot sweep; replayed batches contribute nothing. */
class IncrementalDedupSpec extends SparkSpec {

  test("batched indexing covers one-shot candidates; replay is inert") {
    import spark.implicits._
    val t = "incdedup_idx"
    CdcMerge.dropStateTable(spark, t)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "unrelated words entirely different content here"),
      (4L, "alpha beta gamma delta epsilon zeta"), // dup of 1
      (5L, "one two three four five six eight"),   // near-dup of 2
      (6L, "totally other thing again")).toDF("doc_id", "text")
    def batch(ids: Long*) = docs.filter($"doc_id".isin(ids: _*))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val p1 = IncrementalDedup.indexBatch(spark, t, batch(1, 2, 3))
    val p2 = IncrementalDedup.indexBatch(spark, t, batch(4, 5))
    val replay = IncrementalDedup.indexBatch(spark, t, batch(4, 5))
    val p3 = IncrementalDedup.indexBatch(spark, t, batch(6))
    // replay returns the SAME pair set (idempotent — the crash window
    // between index append and the caller's pair write is covered),
    // and appends nothing to the index (checked below)
    assert(pairSet(replay) == pairSet(p2),
      "replayed batch must reproduce its pair set")

    val got = pairSet(p1) ++ pairSet(p2) ++ pairSet(p3)
    val oneShot = pairSet(DedupOps.lshCandidates(
      DedupOps.lshBands(DedupOps.minhashSignature(docs))))
    assert(got == oneShot,
      s"incremental $got != one-shot $oneShot")
    assert(got.contains((1L, 4L))) // identical docs always collide

    // replay appended nothing: index rows == one-shot band rows
    val bandCount =
      DedupOps.lshBands(DedupOps.minhashSignature(docs)).count()
    assert(spark.table(t).count() == bandCount)
  }

  test("compaction mid-stream preserves candidate coverage and layout") {
    import spark.implicits._
    val t = "incdedup_cidx"
    CdcMerge.dropStateTable(spark, t)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "unrelated words entirely different content here"),
      (4L, "alpha beta gamma delta epsilon zeta"), // dup of 1
      (5L, "one two three four five six eight"),   // near-dup of 2
      (6L, "totally other thing again")).toDF("doc_id", "text")
    def batch(ids: Long*) = docs.filter($"doc_id".isin(ids: _*))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val p1 = IncrementalDedup.indexBatch(spark, t, batch(1, 2, 3))
    val p2 = IncrementalDedup.indexBatch(spark, t, batch(4))
    // the maintenance pass a streaming ingest runs on a cadence:
    // rewrite the accreted per-batch file sets down to the bucket
    // layout's minimal file count...
    val rowsBefore = spark.table(t).count()
    val filesBefore = spark.table(t).inputFiles.length
    LakehouseSink.compact(spark, t, "bkey", 8)
    assert(spark.table(t).count() == rowsBefore,
      "compaction changed index contents")
    assert(spark.table(t).inputFiles.length <= filesBefore,
      "compaction grew the file count")
    // ...and batches indexed AFTER the rewrite still see every earlier
    // band row: total candidate coverage equals the one-shot sweep
    val p3 = IncrementalDedup.indexBatch(spark, t, batch(5, 6))
    val got = pairSet(p1) ++ pairSet(p2) ++ pairSet(p3)
    val oneShot = pairSet(DedupOps.lshCandidates(
      DedupOps.lshBands(DedupOps.minhashSignature(docs))))
    assert(got == oneShot, s"post-compaction $got != one-shot $oneShot")
  }

  test("startIndexStream: streamed batches converge the pair log") {
    import spark.implicits._
    val (idx, pairs) = ("incdedup_sidx", "incdedup_spairs")
    Seq(idx, pairs).foreach(CdcMerge.dropStateTable(spark, _))
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta"), // dup of 1
      (4L, "one two three four five six eight"))   // near-dup of 2
      .toDF("doc_id", "text")
    val src = tmpDir("incdedup-src")
    docs.filter($"doc_id" <= 2).coalesce(1).write.parquet(s"$src/f1")
    docs.filter($"doc_id" > 2).coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = IncrementalDedup.startIndexStream(stream, idx, pairs,
      tmpDir("incdedup-ck"))
    try q.awaitTermination() finally q.stop()

    val logged = spark.table(pairs).select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = DedupOps.lshCandidates(
        DedupOps.lshBands(DedupOps.minhashSignature(docs)))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(logged == oneShot, s"pair log $logged != one-shot $oneShot")
    assert(logged.contains((1L, 3L)))
  }
}
