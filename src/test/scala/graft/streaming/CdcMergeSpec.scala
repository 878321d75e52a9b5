package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC apply/merge: convergence to latest state, tombstone semantics
  * under redelivery, partition-overwrite locality, streaming apply. */
class CdcMergeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def env(rows: (Long, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (k, t, op, id) => (k, ts(t), op, id, s"payload-$id") }
      .toDF("k", "ts", "event_type", "event_id", "content")
  }

  private def apply1(table: String, b: DataFrame): Unit =
    CdcMerge.applyBatch(spark, table, b, "k", Seq("ts", "event_id"), 4)

  private def state(table: String): Map[Long, Long] =
    CdcMerge.readState(spark, table)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("reliable commit checkpoint: merges converge identically with " +
      "spark.graft.commit.reliable=true") {
    // the commit-shape checkpoint (CdcMerge.commitCheckpoint) swaps
    // localCheckpoint for the DFS-backed reliable checkpoint when the
    // conf + a checkpoint dir are set — same rows, same tables, only
    // the materialization's fault tolerance changes (SCALE.md row)
    val t = "merge_reliable"
    Seq(t, s"${t}_stage").foreach(CdcMerge.dropStateTable(spark, _))
    val ckDir = tmpDir("graft-reliable-ck")
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set("spark.graft.commit.reliable", "true")
    try {
      apply1(t, env(
        (1L, "2026-01-01 00:00:01", "Insert", 1L),
        (2L, "2026-01-01 00:00:02", "Insert", 2L)))
      apply1(t, env(
        (1L, "2026-01-01 00:00:03", "Update", 3L),
        (3L, "2026-01-01 00:00:05", "Insert", 5L)))
      assert(state(t) == Map(1L -> 3L, 2L -> 2L, 3L -> 5L))
    } finally {
      spark.conf.set("spark.graft.commit.reliable", "false")
      CdcMerge.dropStateTable(spark, t)
    }
  }

  test("batches converge to latest state; deletes disappear from reads") {
    val t = "merge_basic"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val b1 = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
    val b2 = env(
      (1L, "2026-01-01 00:00:03", "Update", 3L),
      (2L, "2026-01-01 00:00:04", "Delete", 4L),
      (3L, "2026-01-01 00:00:05", "Insert", 5L))
    apply1(t, b1); apply1(t, b2)
    assert(state(t) == Map(1L -> 3L, 3L -> 5L))
    // the delete survives as a tombstone in the raw table
    val raw = spark.table(t).filter(col("k") === 2L).collect()
    assert(raw.length == 1 &&
      raw(0).getAs[String]("event_type") == "Delete")
  }

  test("composite-key merge: per-(k,sub) survivors, sibling-safe deletes") {
    import spark.implicits._
    val t = "merge_composite"
    CdcMerge.dropStateTable(spark, t)
    CdcMerge.dropStateTable(spark, s"${t}_stage")
    def env2(rows: (Long, Long, String, String, Long)*) =
      rows.toSeq.map { case (k, sub, tm, op, id) =>
        (k, sub, ts(tm), op, id) }
        .toDF("k", "sub", "ts", "event_type", "event_id")
    val b1 = env2(
      (1L, 1L, "2026-01-01 00:00:01", "Insert", 1L),
      (1L, 2L, "2026-01-01 00:00:02", "Insert", 2L),
      (2L, 1L, "2026-01-01 00:00:03", "Insert", 3L))
    val b2 = env2(
      (1L, 1L, "2026-01-01 00:00:04", "Update", 4L),
      (1L, 2L, "2026-01-01 00:00:05", "Delete", 5L)) // sibling stays
    def apply2(b: org.apache.spark.sql.DataFrame): Unit =
      CdcMerge.applyBatchKeyed(spark, t, b, Seq("k", "sub"),
        Seq("ts", "event_id"), 4)
    apply2(b1); apply2(b2); apply2(b2) // redelivery: idempotent
    val got = CdcMerge.readState(spark, t)
      .select("k", "sub", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (1,2) deleted without touching (1,1); (2,1) untouched
    assert(got == Map((1L, 1L) -> 4L, (2L, 1L) -> 3L))
    // the tombstone is retained under the composite key
    val raw = spark.table(t)
      .filter(col("k") === 1L && col("sub") === 2L).collect()
    assert(raw.length == 1 &&
      raw(0).getAs[String]("event_type") == "Delete")
  }

  test("snapshot bootstrap: seed + tail converges to full-history state") {
    val t = "merge_bootstrap"
    CdcMerge.dropStateTable(spark, t)
    CdcMerge.dropStateTable(spark, s"${t}_stage")
    // history with every key lifecycle across the cutoff (after id 4):
    //  k=1 insert→update pre-cutoff, untouched by tail  → seed row wins
    //  k=2 deleted pre-cutoff, never seen again          → absent
    //  k=3 deleted pre-cutoff, re-inserted by the tail   → tail row
    //  k=4 inserted pre-cutoff, updated by the tail      → tail row
    //  k=5 first seen in the tail                        → tail row
    val history = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (1L, "2026-01-01 00:00:02", "Update", 2L),
      (2L, "2026-01-01 00:00:03", "Delete", 3L),
      (3L, "2026-01-01 00:00:03", "Delete", 4L),
      (4L, "2026-01-01 00:00:01", "Insert", 3L),
      (3L, "2026-01-01 00:00:05", "Insert", 5L),
      (4L, "2026-01-01 00:00:06", "Update", 6L),
      (5L, "2026-01-01 00:00:07", "Insert", 7L))
    val seed = CdcMerge.snapshotSeed(
      history.filter(col("event_id") <= 4L), "k", Seq("ts", "event_id"))
    // the snapshot carries no deleted keys (like any source snapshot)
    assert(seed.select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 4L))
    apply1(t, seed)
    val tail = history.filter(col("event_id") > 4L)
    apply1(t, tail)
    apply1(t, tail) // redelivered tail: idempotent
    assert(state(t) == Map(1L -> 2L, 3L -> 5L, 4L -> 6L, 5L -> 7L))
  }

  test("redelivered older batch is a no-op: no resurrection, same rows") {
    val t = "merge_replay"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val b1 = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
    val b2 = env(
      (2L, "2026-01-01 00:00:04", "Delete", 4L))
    apply1(t, b1); apply1(t, b2)
    val before = spark.table(t).orderBy("k").collect().toSeq
    // at-least-once: b1 (which INSERTED the now-deleted key 2) replays
    // — the tombstone's higher version must keep winning
    apply1(t, b1)
    assert(spark.table(t).orderBy("k").collect().toSeq == before)
    assert(state(t) == Map(1L -> 1L))
    // and replaying the delete batch is equally a no-op
    apply1(t, b2)
    assert(spark.table(t).orderBy("k").collect().toSeq == before)
  }

  test("merge rewrites only the partitions its batch keys hash into") {
    import spark.implicits._
    val t = "merge_prune"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // pick two keys in DIFFERENT buckets of 4
    val buckets = (1L to 20L).map { k =>
      k -> spark.range(1).select(
        pmod(xxhash64(lit(k)), lit(4))).collect()(0).getLong(0)
    }
    val (kA, bA) = buckets.head
    val (kB, bB) = buckets.find(_._2 != bA).get
    apply1(t, env(
      (kA, "2026-01-01 00:00:01", "Insert", 1L),
      (kB, "2026-01-01 00:00:02", "Insert", 2L)))
    def filesIn(b: Long) =
      spark.table(t).inputFiles.filter(_.contains(s"_kb=$b")).toSet
    val untouchedBefore = filesIn(bB)
    assert(untouchedBefore.nonEmpty)
    // second batch touches only kA's bucket
    apply1(t, env((kA, "2026-01-01 00:00:03", "Update", 3L)))
    assert(filesIn(bA) != Set.empty)
    assert(filesIn(bB) == untouchedBefore,
      "untouched partition was rewritten by the merge")
    assert(state(t) == Map(kA -> 3L, kB -> 2L))
  }

  test("merge reads state through partition pruning on _kb") {
    val t = "merge_pruned_scan"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    apply1(t, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L),
      (3L, "2026-01-01 00:00:03", "Insert", 3L)))
    // the merge-side read: state filtered to the touched buckets must
    // prune at the PARTITION level (directory skip), not row filters —
    // this is what makes per-batch cost ∝ touched data at 100 TB
    val touched = Seq(0L)
    val scan = spark.table(t)
      .filter(col("_kb").isin(touched: _*))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("_kb"),
      s"no partition pruning on _kb:\n$scan")
    // and _kb is not read as a data column (it exists only in the
    // directory layout)
    assert(!scan.contains("PushedFilters: [In(_kb"),
      "bucket filter fell through to row-level pushdown")
  }

  test("one file per partition, however many merges ran") {
    val t = "merge_files"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    (1 to 4).foreach { i =>
      apply1(t, env((1L to 10L).map(k =>
        (k, s"2026-01-0$i 00:00:00", "Insert", i * 100L + k)): _*))
    }
    // without the _kb repartition each merge would fragment every
    // touched partition into shuffle.partitions files
    val perPartition = spark.table(t).inputFiles
      .groupBy(_.split("/").takeWhile(!_.startsWith("part-"))
        .reverse.find(_.startsWith("_kb=")).getOrElse("?"))
    perPartition.foreach { case (kb, files) =>
      assert(files.length == 1, s"$kb has ${files.length} files")
    }
    assert(state(t).size == 10)
  }

  test("vacuum removes only horizon-passed tombstones; drained partition drops") {
    import spark.implicits._
    val t = "merge_vacuum"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // two keys in different buckets of 4, so one partition can drain
    val buckets = (1L to 20L).map { k =>
      k -> spark.range(1).select(
        pmod(xxhash64(lit(k)), lit(4))).collect()(0).getLong(0)
    }
    val (kA, bA) = buckets.head
    val (kB, bB) = buckets.find(_._2 != bA).get
    apply1(t, env(
      (kA, "2026-01-01 00:00:01", "Insert", 1L),
      (kB, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, env(
      (kA, "2026-01-02 00:00:00", "Delete", 3L), // old tombstone
      (kB, "2026-06-01 00:00:00", "Delete", 4L))) // recent tombstone
    assert(state(t).isEmpty)
    val horizon = ts("2026-03-01 00:00:00")
    val removed = CdcMerge.vacuumTombstones(spark, t,
      col("ts") < lit(horizon))
    assert(removed == 1L)
    // the recent tombstone survives (still inside the replay horizon)
    val remaining = spark.table(t).collect()
    assert(remaining.length == 1 && remaining(0).getAs[Long]("k") == kB)
    // kA's partition fully drained -> dropped from the table layout
    assert(!spark.table(t).inputFiles.exists(_.contains(s"_kb=$bA")))
    // and the table keeps merging normally afterwards
    apply1(t, env((kA, "2026-07-01 00:00:00", "Insert", 5L)))
    assert(state(t) == Map(kA -> 5L))
  }

  test("streaming apply converges like the batch path") {
    import spark.implicits._
    val t = "merge_stream"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val src = tmpDir("merge-src")
    // three files -> three micro-batches (maxFilesPerTrigger=1); the
    // LAST event per key decides, whatever batch it lands in
    env((1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
      .write.parquet(s"$src/f1")
    env((1L, "2026-01-01 00:00:03", "Update", 3L),
      (3L, "2026-01-01 00:00:04", "Insert", 4L))
      .write.parquet(s"$src/f2")
    env((3L, "2026-01-01 00:00:05", "Delete", 5L))
      .write.parquet(s"$src/f3")
    val schema = env((0L, "2026-01-01 00:00:00", "Insert", 0L)).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val q = CdcMerge.startMergeStream(stream, t, "k",
      Seq("ts", "event_id"), 4, tmpDir("merge-ck"))
    try q.awaitTermination() finally q.stop()
    assert(state(t) == Map(1L -> 3L, 2L -> 2L))
  }

  test("rebucket re-partitions the state; merges continue at new count") {
    val t = "merge_rebucket"
    Seq(t, s"${t}_stage", s"${t}_rebucketing", s"${t}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L),
      (3L, "2026-01-01 00:00:03", "Insert", 3L),
      (4L, "2026-01-01 00:00:04", "Delete", 4L)))
    val before = state(t)
    CdcMerge.rebucket(spark, t, "k", newBuckets = 16)
    // visible state unchanged, tombstone retained, partitions rehashed
    assert(state(t) == before)
    assert(spark.table(t).filter(col("k") === 4L).count() == 1)
    val badKb = spark.table(t)
      .filter(col("_kb") =!= pmod(xxhash64(col("k")), lit(16)))
    assert(badKb.count() == 0, "a row sits in the wrong new bucket")
    assert(!spark.catalog.tableExists(s"${t}_rebucketing"))
    assert(!spark.catalog.tableExists(s"${t}_old"))
    // merging continues against the new bucket count
    CdcMerge.applyBatch(spark, t, env(
      (3L, "2026-01-01 00:00:05", "Update", 5L),
      (5L, "2026-01-01 00:00:06", "Insert", 6L)),
      "k", Seq("ts", "event_id"), 16)
    assert(state(t) == before + (3L -> 5L) + (5L -> 6L))
    // half-swapped crash state: recovery re-run restores, then swaps
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}_old")
    CdcMerge.rebucket(spark, t, "k", newBuckets = 16)
    assert(state(t) == before + (3L -> 5L) + (5L -> 6L))
    // nothing to recover from -> explicit failure
    intercept[IllegalStateException] {
      CdcMerge.rebucket(spark, "merge_rebucket_missing", "k", 8)
    }
  }

  test("two concurrent fold streams on ONE session leave both tables intact") {
    val ta = "merge_conc_a"; val tb = "merge_conc_b"
    Seq(ta, tb, s"${ta}_stage", s"${tb}_stage")
      .foreach(CdcMerge.dropStateTable(spark, _))
    // seed both tables with keys spanning every bucket
    val keys = (1L to 8L)
    def seed(table: String): Unit = apply1(table,
      env(keys.map(k => (k, "2026-01-01 00:00:01", "Insert", k)): _*))
    seed(ta); seed(tb)
    // interleaved folds on two threads sharing THE SAME session: each
    // batch updates ONE key (one bucket), so any write that degraded
    // to a STATIC overwrite mid-interleave would delete every other
    // bucket's partitions of that table — the exact hazard the
    // mutate-restore partitionOverwriteMode implementation had and
    // the cloned-session write path removes (no session conf is
    // mutated anywhere anymore)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def folds(table: String, key: Long) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        (1 to 6).foreach { i =>
          apply1(table,
            env((key, s"2026-01-01 00:01:0$i", "Update", 100L + i)))
        }
      }
    })
    val fa = folds(ta, 1L); val fb = folds(tb, 2L)
    start.countDown()
    fa.get(300, TimeUnit.SECONDS); fb.get(300, TimeUnit.SECONDS)
    pool.shutdown()
    // every untouched key survives in both tables; the folded key
    // carries its last update
    assert(state(ta) == keys.map(k => k -> k).toMap + (1L -> 106L))
    assert(state(tb) == keys.map(k => k -> k).toMap + (2L -> 106L))
    // and no session conf drift: the session never saw a dynamic set
    assert(spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode").toLowerCase
      == "static")
  }
}
