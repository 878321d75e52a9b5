package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time semantics: late-data drop under watermarks, and the
  * RocksDB state store provider (the 100 TB state path, SCALE.md).
  */
class WatermarkSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("late data beyond the watermark is dropped from windowed aggs") {
    import spark.implicits._
    val src = tmpDir("wm-src")

    // file 1: an early event (creates window 00:00) + on-time events
    // 10:00-11:00. End-of-batch watermark = 11:00 - 2h = 09:00, so the
    // 00:00 window is finalized (emitted + evicted) after this batch.
    Seq((0L, ts("2024-06-01 00:45:00"), 9L, "purchase", 1.0, "{}"),
      (1L, ts("2024-06-01 10:10:00"), 10L, "purchase", 1.0, "{}"),
      (2L, ts("2024-06-01 10:50:00"), 11L, "purchase", 1.0, "{}"),
      (3L, ts("2024-06-01 11:00:00"), 12L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/f1")
    // file 2: an on-time event; during this batch the watermark (09:00,
    // computed from file 1) evicts + emits the 00:00 window with n=1.
    Seq((4L, ts("2024-06-01 11:30:00"), 13L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/f2")
    // file 3: a straggler into the NOW-FINALIZED 00:00 window — this is
    // the row the watermark must discard. (Late rows merging into a
    // still-open window are admitted — allowed lateness; the drop
    // applies once the window has been evicted.)
    Seq((5L, ts("2024-06-01 00:30:00"), 14L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/f3")
    // flatten into one dir with controlled modification order
    val flat = tmpDir("wm-flat")
    var tstamp = System.currentTimeMillis() - 60000
    Seq("f1", "f2", "f3").foreach { sub =>
      new java.io.File(s"$src/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(flat, s"$sub-${f.getName}")
          java.nio.file.Files.copy(f.toPath, dst.toPath)
          dst.setLastModified(tstamp)
          tstamp += 10000
        }
    }

    val stream = spark.readStream.schema(CdcPipeline.eventsSchema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(flat)
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("wm_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("wm-ck")).start()
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    q.stop()

    val windows = spark.table("wm_out")
      .select(date_format($"window.start", "HH:mm").as("w"), $"n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the finalized 00:00 window kept its on-time count of 1 — the
    // straggler did NOT reopen or increment it...
    assert(windows.get("00:00").contains(1L), windows.toString)
    // ...because the watermark dropped the late row
    assert(dropped == 1, s"expected 1 dropped row, got $dropped")
  }

  test("streaming dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    val src = tmpDir("rdb-src")
    graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .repartition(2).write.mode("overwrite").parquet(src)
    val cfg = CdcPipeline.Config(sourceDir = src,
      checkpointDir = tmpDir("rdb-ck"), sinkConf = Map.empty)
    val q = CdcPipeline.dedupStream(spark, cfg)
      .writeStream.format("memory").queryName("rdb_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("rdb-ck2"))
      .start()
    try {
      q.processAllAvailable()
      val usedRocks = q.recentProgress.flatMap(_.stateOperators)
        .exists(_.customMetrics.containsKey("rocksdbGetCount"))
      assert(spark.table("rdb_out").count() > 0)
      // provider is set per-session below; verify it actually engaged
      assert(usedRocks || !spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass").exists(
        _.contains("RocksDB")))
    } finally q.stop()
  }

  test("streaming session windows match the batch session_window result") {
    import spark.implicits._
    val src = tmpDir("sess-src")
    graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .repartition(2).write.mode("overwrite").parquet(src)
    val cfg = CdcPipeline.Config(sourceDir = src,
      checkpointDir = tmpDir("sess-ck"), sinkConf = Map.empty)
    val q = CdcPipeline.sessionCounts(spark, cfg)
      .select($"session_window.start".as("s"), $"user_id", $"n_events")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sess-ck2")).start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits sessions the final watermark closed; every
    // emitted session must agree with the batch operator exactly
    val batch = spark.read.parquet(src)
      .filter(graft.operators.CdcOps.classifyOp(col("event_type")) =!= "Skip")
      .groupBy(session_window($"ts", "24 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"session_window.start".as("s"), $"user_id",
        $"n_events".as("n_batch"))
    val emitted = spark.table("sess_out")
    assert(emitted.count() > 0)
    val joined = emitted.join(batch, Seq("s", "user_id"))
    assert(joined.count() == emitted.count(), "streaming session not in batch")
    assert(joined.filter($"n_events" =!= $"n_batch").count() == 0)
  }

  test("transformWithState (Spark 4 API) matches the batch aggregation") {
    import spark.implicits._
    val src = tmpDir("tws-src")
    graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .repartition(2).write.mode("overwrite").parquet(src)
    val cfg = CdcPipeline.Config(sourceDir = src,
      checkpointDir = tmpDir("tws-ck"), sinkConf = Map.empty)
    val q = CdcPipeline.statefulUserTotalsTws(spark, cfg)
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("tws-ck2")).start()
    try q.processAllAvailable() finally q.stop()
    val last = spark.table("tws_out")
      .groupBy($"user_id").agg(max($"n_events").as("n"))
    val expected = spark.read.parquet(src)
      .filter(graft.operators.CdcOps.classifyOp(col("event_type")) =!= "Skip")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    assert(last.join(expected, Seq("user_id"))
      .filter(last("n") =!= expected("n")).count() == 0)
    assert(last.count() == expected.count())
  }

  override def withFixture(test: NoArgTest) = {
    // RocksDB provider for this suite only
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try super.withFixture(test)
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
