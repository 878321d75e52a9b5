package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-data-feed over the merge: per-commit visible-state diffs,
  * replay idempotence, partition-pruned reads, metadata-only
  * retention. */
class ChangeFeedSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def env(rows: (Long, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (k, t, op, id) => (k, ts(t), op, id, s"payload-$id") }
      .toDF("k", "ts", "event_type", "event_id", "content")
  }

  private def apply1(state: String, feed: String, id: Long,
      b: DataFrame): Unit =
    ChangeFeed.applyBatch(spark, state, feed, b, "k",
      Seq("ts", "event_id"), nBuckets = 4, batchId = id)

  private def feedRows(feed: String): Seq[(Long, String, Long, Long)] =
    spark.table(feed)
      .select("_commit", "_change_type", "k", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted

  test("feed records insert/update pre+post/delete per commit") {
    val (t, f) = ("cf_state", "cf_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, f, 1, env(
      (1L, "2026-01-01 00:00:03", "Update", 3L),   // update
      (2L, "2026-01-01 00:00:04", "Delete", 4L),   // delete
      (3L, "2026-01-01 00:00:05", "Insert", 5L)))  // insert
    assert(feedRows(f) == Seq(
      (0L, "insert", 1L, 1L),
      (0L, "insert", 2L, 2L),
      (1L, "delete", 2L, 2L),            // pre-image of the delete
      (1L, "insert", 3L, 5L),
      (1L, "update_postimage", 1L, 3L),
      (1L, "update_preimage", 1L, 1L)))
    // the delete change carries the pre-image payload, not the
    // tombstone's
    val del = spark.table(f)
      .filter(col("_change_type") === "delete").collect()(0)
    assert(del.getAs[String]("content") == "payload-2")
  }

  test("tombstone-only transitions emit nothing visible") {
    val (t, f) = ("cf_tomb", "cf_tomb_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    // delete of a key that never existed: no visible change
    apply1(t, f, 0, env((9L, "2026-01-01 00:00:01", "Delete", 1L)))
    assert(spark.table(f).count() == 0)
    // a newer delete of the same (still deleted) key: still nothing
    apply1(t, f, 1, env((9L, "2026-01-01 00:00:02", "Delete", 2L)))
    assert(spark.table(f).count() == 0)
    // insert OVER the tombstone surfaces as a plain insert
    apply1(t, f, 2, env((9L, "2026-01-01 00:00:03", "Insert", 3L)))
    assert(feedRows(f) == Seq((2L, "insert", 9L, 3L)))
  }

  test("redelivered batch adds nothing; crash window replays identically") {
    val (t, f) = ("cf_replay", "cf_replay_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    val b0 = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
    val b1 = env((1L, "2026-01-01 00:00:03", "Update", 3L))
    apply1(t, f, 0, b0); apply1(t, f, 1, b1)
    val before = feedRows(f)
    // at-least-once redelivery AFTER the state committed: the merge
    // no-ops, the diff is empty, the feed keeps its original rows
    apply1(t, f, 1, b1)
    assert(feedRows(f) == before)
    // crash BETWEEN feed write and state commit: simulate by writing
    // batch 2's diff without committing the merge, then replaying the
    // full applyBatch — the partition is overwritten with the same
    // content, not appended to
    val b2 = env((2L, "2026-01-01 00:00:09", "Update", 9L))
    val oldTouched = spark.table(t)
    ChangeFeed.writeChanges(spark, f,
      ChangeFeed.diff(
        oldTouched,
        oldTouched.filter(col("k") =!= 2L).unionByName(
          b2.withColumn("_kb", pmod(xxhash64(col("k")), lit(4)))),
        "k", Seq("ts", "event_id"), "event_type", "Delete"), 2L)
    val afterCrash = feedRows(f)
    apply1(t, f, 2, b2) // the replay
    assert(feedRows(f) == afterCrash)
    assert(feedRows(f).count(_._1 == 2L) == 2) // one pre + one post
  }

  test("readChanges prunes to the requested commits; vacuum is metadata-only") {
    val (t, f) = ("cf_read", "cf_read_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    (0 to 3).foreach { i =>
      apply1(t, f, i.toLong, env(
        (100L + i, s"2026-01-0${i + 1} 00:00:01", "Insert", i.toLong)))
    }
    val changes = ChangeFeed.readChanges(spark, f, 2, 3)
    assert(changes.select("k").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(102L, 103L))
    // partition pruning, not a full scan + row filter
    val plan = changes.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_commit"),
      s"no partition pruning on _commit:\n$plan")
    // retention: drop commits < 2, data files for 0/1 disappear
    assert(ChangeFeed.vacuum(spark, f, keepFrom = 2) == 2)
    assert(spark.table(f).select("_commit").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(!spark.table(f).inputFiles.exists(_.contains("_commit=0")))
    // feed keeps accepting commits afterwards
    apply1(t, f, 4, env((200L, "2026-02-01 00:00:01", "Insert", 40L)))
    assert(feedRows(f).map(_._1).max == 4L)
  }

  test("stateAsOf reconstructs any commit; latest equals readState") {
    val (t, f) = ("cf_asof", "cf_asof_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, f, 1, env(
      (1L, "2026-01-01 00:00:03", "Update", 3L),
      (2L, "2026-01-01 00:00:04", "Delete", 4L)))
    apply1(t, f, 2, env(
      (2L, "2026-01-01 00:00:05", "Insert", 5L),
      (3L, "2026-01-01 00:00:06", "Insert", 6L)))
    def asOf(c: Long): Map[Long, Long] =
      ChangeFeed.stateAsOf(spark, f, "k", c)
        .select("k", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asOf(0) == Map(1L -> 1L, 2L -> 2L))
    assert(asOf(1) == Map(1L -> 3L)) // key 2 deleted at commit 1
    assert(asOf(2) == Map(1L -> 3L, 2L -> 5L, 3L -> 6L))
    // completeness: the feed journal reproduces the live state exactly
    val fromState = CdcMerge.readState(spark, t)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asOf(Long.MaxValue) == fromState)
  }

  test("feed-tailing consumer maintains a derived aggregate exactly") {
    val (t, f, a) = ("cf_agg", "cf_agg_feed", "cf_agg_view")
    Seq(t, s"${t}_stage", f, a, s"${a}_stage", s"${a}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L),
      (3L, "2026-01-01 00:00:03", "Insert", 3L)))
    apply1(t, f, 1, env(
      (1L, "2026-01-01 00:00:04", "Update", 4L),
      (2L, "2026-01-01 00:00:05", "Delete", 5L)))
    apply1(t, f, 2, env((4L, "2026-01-01 00:00:06", "Insert", 6L)))
    // group: parity of the key; value: event_id
    def applyTo(upTo: Long): Unit =
      ChangeFeed.applyFeedToAggregate(spark, f, a,
        pmod(col("k"), lit(2)).cast("string"), "event_id", upTo)
    def agg(): Map[String, (Long, java.math.BigDecimal)] =
      ChangeFeed.readAggregate(spark, a).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2)))).toMap
    // consume in two slices with an overlapping (idempotent) re-poll.
    // After commits 0..1 the live state is keys 1 (ev4) and 3 (ev3) —
    // both parity 1; parity 0's only key (2) was deleted, so its
    // drained group is filtered from reads (watermark row remains)
    applyTo(1)
    val mid = agg()
    assert(mid.keySet == Set("1") && mid("1")._1 == 2L &&
      mid("1")._2.doubleValue == 7.0)
    applyTo(1) // re-poll of a covered range: no-op
    assert(agg() == mid)
    applyTo(10) // clamped to the feed's max commit (2)
    val fin = agg()
    // expected from live state: keys 1(ev4),3(ev3),4(ev6) →
    // parity 1: keys 1,3 → n=2, sum=4+3; parity 0: key 4 → n=1, sum=6
    assert(fin.view.mapValues(_._1).toMap == Map("0" -> 1L, "1" -> 2L))
    assert(fin("1")._2.doubleValue == 7.0)
    assert(fin("0")._2.doubleValue == 6.0)
    // the clamp kept the watermark at 2: a late commit still applies
    apply1(t, f, 3, env((5L, "2026-01-01 00:00:07", "Insert", 7L)))
    applyTo(10)
    assert(agg().view.mapValues(_._1).toMap == Map("0" -> 1L, "1" -> 3L))
  }

  test("squash compacts a commit range to its net diff") {
    val (t, f) = ("cf_squash", "cf_squash_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, f, 1, env(
      (3L, "2026-01-01 00:00:03", "Insert", 3L),   // lives on
      (1L, "2026-01-01 00:00:04", "Update", 4L)))  // ping 1
    apply1(t, f, 2, env(
      (1L, "2026-01-01 00:00:05", "Update", 5L),   // pong 1
      (3L, "2026-01-01 00:00:06", "Delete", 6L),   // cancels commit 1
      (2L, "2026-01-01 00:00:07", "Delete", 7L)))  // deletes pre-range
    apply1(t, f, 3, env((4L, "2026-01-01 00:00:08", "Insert", 8L)))
    def asOf(c: Long) = ChangeFeed.stateAsOf(spark, f, "k", c)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asOf2 = asOf(2); val asOf3 = asOf(3)
    val dropped = ChangeFeed.squash(spark, f, "k",
      Seq("ts", "event_id"), fromBatch = 1, toBatch = 2)
    assert(dropped == 1) // partition _commit=1
    // reads outside the squashed range are unchanged
    assert(asOf(0) == Map(1L -> 1L, 2L -> 2L))
    assert(asOf(2) == asOf2 && asOf(3) == asOf3)
    // the net diff cancelled key 3 entirely (insert→delete inside the
    // range) and collapsed key 1's two updates to one pair
    val netRows = spark.table(f).filter(col("_commit") === 2)
      .select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(netRows == Set(
      ("update_preimage", 1L), ("update_postimage", 1L),
      ("delete", 2L)))
    // a consumer from watermark < fromBatch still lands exactly
    val a = "cf_squash_view"
    Seq(a, s"${a}_stage", s"${a}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))
    ChangeFeed.applyFeedToAggregate(spark, f, a,
      lit("all"), "event_id", Long.MaxValue)
    val view = ChangeFeed.readAggregate(spark, a).collect()(0)
    assert(view.getLong(1) == 2L) // keys 1 and 4 live
    assert(asOf(Long.MaxValue) ==
      CdcMerge.readState(spark, t)
        .select("k", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("squash with an exactly-cancelling range CLEARS the terminal " +
      "commit partition") {
    val (t, f) = ("cf_squash0", "cf_squash0_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env((1L, "2026-01-01 00:00:01", "Insert", 1L)))
    // commits 1..2 cancel exactly: insert 5 then delete 5
    apply1(t, f, 1, env((5L, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, f, 2, env((5L, "2026-01-01 00:00:03", "Delete", 3L)))
    val dropped = ChangeFeed.squash(spark, f, "k",
      Seq("ts", "event_id"), fromBatch = 1, toBatch = 2)
    assert(dropped == 1) // partition _commit=1
    // the empty net diff must CLEAR _commit=2, not keep its original
    // rows (which would read as changes relative to commit 1, a state
    // the squash just erased) — the r15 advice
    spark.catalog.refreshTable(f)
    assert(spark.table(f).filter(col("_commit") === 2).isEmpty)
    // state reads unchanged on both sides of the squashed range
    def asOf(c: Long) = ChangeFeed.stateAsOf(spark, f, "k", c)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(asOf(0) == Set(1L) && asOf(2) == Set(1L))
  }

  test("empty-net squash drop order: the crash window reads exactly " +
      "and a re-run converges") {
    // the r16 review: dropping the toBatch partition FIRST un-shadows
    // the older range commits — a crash then has stateAsOf(toBatch)
    // reading a mid-range state, and the re-run bakes that wrong
    // state into a fresh net diff forever. The fixed order (stale
    // ascending, toBatch LAST) keeps every key's surviving newest
    // change authoritative at every crash point.
    val (t, f) = ("cf_squash1", "cf_squash1_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    apply1(t, f, 0, env((1L, "2026-01-01 00:00:01", "Insert", 1L)))
    apply1(t, f, 1, env((5L, "2026-01-01 00:00:02", "Insert", 2L)))
    apply1(t, f, 2, env((5L, "2026-01-01 00:00:03", "Delete", 3L)))
    def asOf(c: Long) = ChangeFeed.stateAsOf(spark, f, "k", c)
      .select("k").collect().map(_.getLong(0)).toSet
    // simulate a crash after the fixed order's FIRST step (stale
    // commit 1 dropped, terminal commit 2 still present): the delete
    // at commit 2 still shadows the vanished insert, so reads at or
    // above toBatch stay exact
    spark.sql(s"ALTER TABLE $f DROP IF EXISTS PARTITION (_commit=1)")
    spark.catalog.refreshTable(f)
    assert(asOf(2) == Set(1L),
      "mid-crash state must read exactly at >= toBatch")
    // re-running the squash from the crash state converges to the
    // clean end state (empty net again, remaining drops finish)
    ChangeFeed.squash(spark, f, "k", Seq("ts", "event_id"),
      fromBatch = 1, toBatch = 2)
    spark.catalog.refreshTable(f)
    assert(spark.table(f).filter(col("_commit") >= 1).isEmpty,
      "re-run did not finish the drops")
    assert(asOf(0) == Set(1L) && asOf(2) == Set(1L),
      "re-run left a corrupted feed")
  }

  test("streaming merge with feed: commits keyed by micro-batch id") {
    import spark.implicits._
    val (t, f) = ("cf_stream", "cf_stream_feed")
    Seq(t, s"${t}_stage", f).foreach(CdcMerge.dropStateTable(spark, _))
    val src = tmpDir("cf-src")
    // one part-file per logical batch so maxFilesPerTrigger=1 maps
    // files to micro-batches 1:1
    env((1L, "2026-01-01 00:00:01", "Insert", 1L))
      .coalesce(1).write.parquet(s"$src/f1")
    env((1L, "2026-01-01 00:00:02", "Update", 2L),
      (2L, "2026-01-01 00:00:03", "Insert", 3L))
      .coalesce(1).write.parquet(s"$src/f2")
    val schema = env((0L, "2026-01-01 00:00:00", "Insert", 0L)).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val q = ChangeFeed.startMergeStream(stream, t, f, "k",
      Seq("ts", "event_id"), 4, tmpDir("cf-ck"))
    try q.awaitTermination() finally q.stop()
    assert(CdcMerge.readState(spark, t).count() == 2)
    val commits = feedRows(f).map(_._1).distinct.sorted
    assert(commits == Seq(0L, 1L))
    assert(feedRows(f).filter(_._1 == 1L).map(_._2).sorted ==
      Seq("insert", "update_postimage", "update_preimage"))
  }
}
