package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental SCD2 maintenance: chain equality with the batch view,
  * late-event interval splits, replay idempotence, current-state
  * equivalence with CdcMerge. */
class Scd2MergeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def env(rows: (Long, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (k, t, op, id) => (k, ts(t), op, id, s"v-$id") }
      .toDF("k", "ts", "event_type", "event_id", "payload")
  }

  private def apply1(table: String, b: DataFrame): Unit =
    Scd2Merge.applyBatch(spark, table, b, "k", "ts", "event_id", 4)

  /** (k, event_id) -> (valid_to event_id or -1, is_current). */
  private def chain(table: String): Map[(Long, Long), (String, Boolean)] =
    Scd2Merge.readHistory(spark, table)
      .select(col("k"), col("event_id"),
        coalesce(col("_valid_to").cast("string"), lit("open"))
          .as("vt"),
        col("_is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getBoolean(3))).toMap

  private def drop(t: String): Unit =
    Seq(t, s"${t}_stage").foreach(CdcMerge.dropStateTable(spark, _))

  test("chains converge; late event splits a closed interval") {
    val t = "scd2_basic"
    drop(t)
    val b1 = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
    val b2 = env(
      (1L, "2026-01-01 00:00:09", "Update", 9L),
      (2L, "2026-01-01 00:00:08", "Delete", 8L))
    apply1(t, b1); apply1(t, b2)
    assert(chain(t) == Map(
      (1L, 1L) -> ("2026-01-01 00:00:09", false),
      (1L, 9L) -> ("open", true),
      (2L, 2L) -> ("2026-01-01 00:00:08", false),
      (2L, 8L) -> ("open", true)))
    // a LATE event for key 1 lands BETWEEN 1 and 9: it must split the
    // [1, 9) interval, closing itself at 9's ts
    apply1(t, env((1L, "2026-01-01 00:00:05", "Update", 5L)))
    assert(chain(t) == Map(
      (1L, 1L) -> ("2026-01-01 00:00:05", false),
      (1L, 5L) -> ("2026-01-01 00:00:09", false),
      (1L, 9L) -> ("open", true),
      (2L, 2L) -> ("2026-01-01 00:00:08", false),
      (2L, 8L) -> ("open", true)))
  }

  test("replayed batch is a no-op; current view matches CdcMerge") {
    val t = "scd2_replay"
    val tm = "scd2_replay_latest"
    drop(t); drop(tm)
    val b1 = env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L),
      (3L, "2026-01-01 00:00:03", "Insert", 3L))
    val b2 = env(
      (1L, "2026-01-01 00:00:04", "Update", 4L),
      (2L, "2026-01-01 00:00:05", "Delete", 5L))
    Seq(b1, b2, b2).foreach(apply1(t, _)) // b2 redelivered
    val replayed = chain(t)
    assert(replayed.size == 5)
    assert(replayed((2L, 5L)) == ("open", true)) // tombstone interval
    // equivalent latest-state table over the same (un-replayed) stream
    Seq(b1, b2).foreach(b =>
      CdcMerge.applyBatch(spark, tm, b, "k", Seq("ts", "event_id"), 4))
    val cur = Scd2Merge.readCurrent(spark, t)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val latest = CdcMerge.readState(spark, tm)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cur == latest && cur == Map(1L -> 4L, 3L -> 3L))
  }

  test("stateAt: point-in-time reads off the maintained intervals") {
    val t = "scd2_asof"
    drop(t)
    apply1(t, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (1L, "2026-01-03 00:00:00", "Update", 3L),
      (2L, "2026-01-02 00:00:00", "Insert", 2L),
      (2L, "2026-01-04 00:00:00", "Delete", 4L)))
    def st(s: String) =
      Scd2Merge.stateAt(spark, t, ts(s))
        .select("k", "event_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st("2026-01-01 12:00:00") == Map(1L -> 1L))
    assert(st("2026-01-02 12:00:00") == Map(1L -> 1L, 2L -> 2L))
    assert(st("2026-01-03 12:00:00") == Map(1L -> 3L, 2L -> 2L))
    assert(st("2026-01-05 00:00:00") == Map(1L -> 3L)) // key 2 deleted
    val current = Scd2Merge.readCurrent(spark, t)
      .select("k", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st("2026-01-05 00:00:00") == current)
  }

  test("vacuumClosed removes only pre-cutoff closed intervals") {
    val t = "scd2_vacuum"
    drop(t)
    apply1(t, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L),
      (1L, "2026-01-02 00:00:00", "Update", 2L),
      (1L, "2026-01-05 00:00:00", "Update", 3L),
      (2L, "2026-01-01 00:00:02", "Insert", 4L), // closed at 01-06
      (2L, "2026-01-06 00:00:00", "Update", 5L),
      (3L, "2026-01-01 00:00:03", "Insert", 6L))) // still open
    val removed = Scd2Merge.vacuumClosed(spark, t,
      ts("2026-01-03 00:00:00"))
    // rows closed before 01-03: key 1's first version only
    assert(removed == 1L)
    val left = chain(t)
    assert(!left.contains((1L, 1L)))
    // retained chain unchanged: row 2 still closes at row 3's ts,
    // open rows untouched
    assert(left((1L, 2L)) == ("2026-01-05 00:00:00", false))
    assert(left((1L, 3L)) == ("open", true))
    assert(left((3L, 6L)) == ("open", true))
    assert(left.size == 5)
    // idempotent: nothing else is prunable
    assert(Scd2Merge.vacuumClosed(spark, t,
      ts("2026-01-03 00:00:00")) == 0L)
    // a later merge on a vacuumed key still chains correctly
    apply1(t, env((1L, "2026-01-07 00:00:00", "Update", 7L)))
    assert(chain(t)((1L, 3L)) == ("2026-01-07 00:00:00", false))
    assert(chain(t)((1L, 7L)) == ("open", true))
  }

  test("startScd2Stream resumes from its checkpoint without loss") {
    import spark.implicits._
    val t = "scd2_stream"
    drop(t)
    val src = tmpDir("scd2-src")
    val ck = tmpDir("scd2-ck")
    val schema = env((0L, "2026-01-01 00:00:00", "Insert", 0L)).schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
      val q = Scd2Merge.startScd2Stream(stream, t, "k", "ts",
        "event_id", nBuckets = 4, checkpointDir = ck)
      try q.awaitTermination() finally q.stop()
    }
    env((1L, "2026-01-01 00:00:01", "Insert", 1L),
      (2L, "2026-01-01 00:00:02", "Insert", 2L))
      .coalesce(1).write.parquet(s"$src/f1")
    run()
    assert(chain(t).size == 2)
    // new arrivals after a stop: the resumed stream processes ONLY
    // them (offsets from the checkpoint) and the chain stays exact
    env((1L, "2026-01-01 00:00:05", "Update", 5L),
      (2L, "2026-01-01 00:00:06", "Delete", 6L))
      .coalesce(1).write.parquet(s"$src/f2")
    run()
    assert(chain(t) == Map(
      (1L, 1L) -> ("2026-01-01 00:00:05", false),
      (1L, 5L) -> ("open", true),
      (2L, 2L) -> ("2026-01-01 00:00:06", false),
      (2L, 6L) -> ("open", true)))
  }

  test("stage leftovers from a crashed merge do not corrupt the next") {
    import spark.implicits._
    val t = "scd2_crash"
    drop(t)
    apply1(t, env((1L, "2026-01-01 00:00:01", "Insert", 1L)))
    // simulate a crash AFTER the stage write, BEFORE the overwrite:
    // a stale stage table with bogus content is left behind
    spark.table(t).withColumn("event_id", lit(999L))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${t}_stage")
    // the next merge must overwrite the stage, not absorb it
    apply1(t, env((1L, "2026-01-01 00:00:02", "Update", 2L)))
    assert(chain(t) == Map(
      (1L, 1L) -> ("2026-01-01 00:00:02", false),
      (1L, 2L) -> ("open", true)))
    assert(!spark.catalog.tableExists(s"${t}_stage"))
    // ... and a stale stage DIRECTORY without a catalog entry (crash
    // mid-saveAsTable) is cleared too, not tripped over
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dir = new java.io.File(new java.io.File(new java.net.URI(wh)),
      s"${t}_stage")
    dir.mkdirs()
    new java.io.File(dir, "orphan.parquet").createNewFile()
    apply1(t, env((2L, "2026-01-01 00:00:03", "Insert", 3L)))
    assert(chain(t).size == 3)
    assert(!spark.catalog.tableExists(s"${t}_stage"))
  }

  test("untouched partitions are not rewritten by a merge") {
    val t = "scd2_prune"
    drop(t)
    // keys 1..8 spread over 4 _kb partitions
    apply1(t, env((1L to 8L).map(k =>
      (k, f"2026-01-01 00:00:0$k", "Insert", k)): _*))
    val files0 = spark.table(t).inputFiles.toSet
    // touch ONLY key 1's partition
    apply1(t, env((1L, "2026-01-01 00:01:00", "Update", 100L)))
    val kb1 = spark.table(t).filter(col("event_id") === 100L)
      .select("_kb").collect()(0).getLong(0)
    val files1 = spark.table(t).inputFiles.toSet
    val untouched0 = files0.filterNot(_.contains(s"_kb=$kb1"))
    val untouched1 = files1.filterNot(_.contains(s"_kb=$kb1"))
    assert(untouched0 == untouched1,
      "merge rewrote files outside the touched partition")
    assert(files0.filter(_.contains(s"_kb=$kb1")) !=
      files1.filter(_.contains(s"_kb=$kb1")))
  }
}
