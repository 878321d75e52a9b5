package graft.streaming

import graft.SparkSpec
import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** IncrementalDocFreq (additive append-shaped df): batched fold ==
  * one-shot rarity keywords; replay no-op (watermark) and idempotent
  * through the crash window (generation overwrite against the OLD
  * watermark); folds append — existing files never rewritten;
  * compaction preserves df and N; a shard request scores against the
  * CORPUS df (where a per-batch one-shot is simply wrong). */
class IncrementalDocFreqSpec extends SparkSpec {

  private val table = "dfspec_state"

  private def freshTable(): Unit =
    IncrementalDocFreq.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // every doc: 3 corpus-common words + 2 words shared by its
  // (doc_id % 4) group + one unique word
  private def docs = {
    import spark.implicits._
    (0L until 24L).map { i =>
      val g = i % 4
      (i, s"alpha beta gamma grp${g}_a grp${g}_b uniq_$i")
    }.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def oneShot = rows(CurationOps.rarityKeywords(docs, m = 3))

  private def view(req: org.apache.spark.sql.DataFrame) =
    rows(IncrementalDocFreq.keywordView(spark, table, req, m = 3))

  test("batched fold == one-shot rarity keywords; replay no-op; " +
      "crash-window replay idempotent (old watermark restored)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDocFreq.applyBatch(spark, table, part(i),
        batchId = i))
    assert(IncrementalDocFreq.nDocs(spark, table) == 24L)
    val before = view(docs)
    assert(before == oneShot && before.nonEmpty)
    // clean replay: watermark short-circuits before any job
    IncrementalDocFreq.applyBatch(spark, table, part(1), batchId = 1)
    assert(view(docs) == before)
    // CRASH-WINDOW replay: the grid write for batch 1 landed but the
    // watermark write was lost — restore the POST-BATCH-0 watermark
    // (batch id 0, N = batch 0's docs) and re-fold batch 1: the
    // dynamic overwrite must replace its own generation, and N must
    // advance exactly once
    val n0 = part(0).count()
    TableSwap.writeStaged(spark,
      Seq((0L, n0)).toDF("_batch", "_n_docs"), s"${table}_wm")
    IncrementalDocFreq.applyBatch(spark, table, part(1), batchId = 1)
    assert(IncrementalDocFreq.nDocs(spark, table) == n0 + part(1).count())
    // grid content for batches 0-1 is intact and unduplicated: fold
    // batch 2 again under a fresh id and re-check the full report
    IncrementalDocFreq.applyBatch(spark, table, part(2), batchId = 2)
    assert(IncrementalDocFreq.nDocs(spark, table) == 24L)
    assert(view(docs) == before)
  }

  test("a fold APPENDS: existing df files are never rewritten; " +
      "compaction preserves df and N") {
    import spark.implicits._
    freshTable()
    IncrementalDocFreq.applyBatch(spark, table,
      docs.filter($"doc_id" < 12), batchId = 0, nBuckets = 8)
    val filesBefore = spark.table(table).inputFiles.toSet
    // the second batch repeats the corpus-common words — the Zipf
    // case that made a merge-shaped table touch every bucket
    IncrementalDocFreq.applyBatch(spark, table,
      docs.filter($"doc_id" >= 12), batchId = 1, nBuckets = 8)
    val filesAfter = spark.table(table).inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "an existing generation's files were rewritten by an append")
    val dfBefore = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    IncrementalDocFreq.compact(spark, table)
    val dfAfter = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfAfter == dfBefore)
    assert(IncrementalDocFreq.nDocs(spark, table) == 24L)
    // compaction summed the generations down to one per bucket
    assert(spark.table(table).select("_b").distinct().count() == 1)
    assert(view(docs) == oneShot)
  }

  test("compactBuckets sums fragmented buckets in place: df/N/keyword " +
      "view unchanged, compacted buckets drop to one partition, no " +
      "table rename, re-run no-op, later folds append beside the " +
      "compacted partition") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDocFreq.applyBatch(spark, table, part(i),
        batchId = i, nBuckets = 8))
    val dfBefore = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val kvBefore = view(docs)
    // Zipf keys: every batch wrote every bucket → all 8 fragmented
    val compacted = IncrementalDocFreq.compactBuckets(spark, table,
      minParts = 2)
    assert(compacted.nonEmpty)
    compacted.foreach { kb =>
      val parts = spark.sql(s"SHOW PARTITIONS $table").collect()
        .map(_.getString(0)).count(_.endsWith(s"_kb=$kb"))
      assert(parts == 1, s"bucket $kb holds $parts partitions")
    }
    assert(IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == dfBefore)
    assert(IncrementalDocFreq.nDocs(spark, table) == 24L)
    assert(view(docs) == kvBefore)
    assert(IncrementalDocFreq.compactBuckets(spark, table,
      minParts = 2).isEmpty)
    // a later fold appends a fresh positive generation beside the
    // compacted partitions and the df stays exact
    val extra = Seq((100L, "alpha beta nova_1")).toDF("doc_id", "text")
    IncrementalDocFreq.applyBatch(spark, table, extra, batchId = 3,
      nBuckets = 8)
    val dfAfter = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dfAfter("alpha") == dfBefore.toMap.apply("alpha") + 1)
    assert(dfAfter("nova_1") == 1L)
    assert(IncrementalDocFreq.nDocs(spark, table) == 25L)
    // and the whole-grid compact still collapses everything
    IncrementalDocFreq.compact(spark, table)
    assert(spark.table(table).select("_b").distinct().count() == 1)
    assert(IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == dfAfter)
  }

  test("serve paths are SNAPSHOT-CONSISTENT: while a crash window is " +
      "open (grid written, watermark not), dfReport/keywordView/nDocs " +
      "serve the pre-batch state — df can never include a batch that " +
      "N excludes") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    def dfRows() = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    IncrementalDocFreq.applyBatch(spark, table, part(0), batchId = 0)
    val n0 = part(0).count()
    val df0 = dfRows()
    val kv0 = view(part(0))
    IncrementalDocFreq.applyBatch(spark, table, part(1), batchId = 1)
    val df1 = dfRows()
    val kv1 = view(part(0))
    assert(df1 != df0)
    // reopen batch 1's crash window: generation on disk, watermark
    // rewound — every serve must show exactly the post-batch-0 state
    // (the r13 finding was df including batch 1 while N excluded it)
    TableSwap.writeStaged(spark,
      Seq((0L, n0)).toDF("_batch", "_n_docs"), s"${table}_wm")
    assert(IncrementalDocFreq.nDocs(spark, table) == n0)
    assert(dfRows() == df0)
    assert(view(part(0)) == kv0)
    // re-deliver (commit) batch 1: the full state serves again
    IncrementalDocFreq.applyBatch(spark, table, part(1), batchId = 1)
    assert(dfRows() == df1)
    assert(view(part(0)) == kv1)
  }

  test("a shard request scores against the CORPUS df — equal to the " +
      "one-shot's rows for those docs, not to a shard-local one-shot") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDocFreq.applyBatch(spark, table, part(i),
        batchId = i))
    val shard = docs.filter($"doc_id" < 4)
    val served = view(shard)
    val expected = oneShot.filter(_._1 < 4)
    assert(served == expected && served.nonEmpty)
    // the motivating wrongness: a shard-local one-shot disagrees
    // (batch-local df calls corpus-common words rare)
    val local = rows(CurationOps.rarityKeywords(shard, m = 3))
    assert(local != expected)
  }

  test("compactBuckets reclaims drop-phase leftovers regardless of " +
      "minParts: shadowed junk below the fragmentation threshold is " +
      "dropped without a fold, view unchanged") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalDocFreq.applyBatch(spark, table, part(i),
        batchId = i, nBuckets = 8))
    val compacted = IncrementalDocFreq.compactBuckets(spark, table,
      minParts = 2)
    assert(compacted.nonEmpty)
    val dfBefore = IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // simulate a crash DURING the drop phase: re-create one shadowed
    // source partition under a compacted bucket (content irrelevant —
    // resolved() skips shadowed partitions, it is dead disk data)
    val kb = compacted.head
    spark.sql(s"INSERT INTO TABLE $table " +
      s"PARTITION (_b='0', _kb='$kb') VALUES ('zzz_leftover', 1)")
    assert(IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == dfBefore, "a shadowed leftover leaked into the served df")
    // the bucket now holds 2 partitions, BELOW minParts=4: the old
    // target predicate skipped it forever (the r14 advice); the
    // leftover rule targets it drop-only
    val cleaned = IncrementalDocFreq.compactBuckets(spark, table,
      minParts = 4)
    assert(cleaned == Seq(kb))
    val parts = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0)).count(_.endsWith(s"_kb=$kb"))
    assert(parts == 1, s"bucket $kb still holds $parts partitions")
    assert(IncrementalDocFreq.dfReport(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == dfBefore)
    // converged: a re-run is a no-op
    assert(IncrementalDocFreq.compactBuckets(spark, table,
      minParts = 4).isEmpty)
  }
}
