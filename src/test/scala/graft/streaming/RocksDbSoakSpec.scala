package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Soak test for streaming dedup on RocksDB: many micro-batches with
  * re-delivered duplicates, asserting exact dedup output, bounded
  * state, and that the RocksDB provider is actually engaged.
  */
class RocksDbSoakSpec extends SparkSpec {

  test("dedupStream soak: 8 batches, 50% redelivery, bounded state") {
    import spark.implicits._
    val src = tmpDir("soak-src")
    val base = Timestamp.valueOf("2024-06-01 10:00:00").getTime

    // 8 files -> 8 micro-batches. Each batch carries 400 fresh events
    // plus a 50% re-delivery of the PREVIOUS batch (same event_id ->
    // same gtid, the at-least-once duplicate shape). Timestamps advance
    // one minute per batch, so re-deliveries are well inside the 1h
    // watermark and MUST be dropped by state, not by lateness.
    val perBatch = 400
    var tstamp = System.currentTimeMillis() - 120000
    (0 until 8).foreach { b =>
      val fresh = (0 until perBatch).map { i =>
        val id = b.toLong * perBatch + i
        (id, new Timestamp(base + b * 60000L + (i % 50)), id % 97,
          "purchase", 1.0, s"""{"k": $i}""")
      }
      val redelivered = if (b == 0) Nil else (0 until perBatch / 2).map { i =>
        val id = (b - 1).toLong * perBatch + i
        (id, new Timestamp(base + (b - 1) * 60000L + (i % 50)), id % 97,
          "purchase", 1.0, s"""{"k": $i}""")
      }
      val dir = tmpDir(s"soak-stage-$b")
      (fresh ++ redelivered)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(src, s"b$b-${f.getName}")
          java.nio.file.Files.copy(f.toPath, dst.toPath)
          dst.setLastModified(tstamp)
          tstamp += 5000
        }
    }

    val cfg = CdcPipeline.Config(sourceDir = src,
      checkpointDir = tmpDir("soak-ck"),
      policy = FlushPolicy(batchSize = 1)) // maxFilesPerTrigger=1
    val q = CdcPipeline.dedupStream(spark, cfg)
      .select("gtid", "event_id")
      .writeStream.format("memory").queryName("soak_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("soak-ck2"))
      .start()
    try {
      q.processAllAvailable()
      val progress = q.recentProgress
      // really soaked: one micro-batch per file
      assert(progress.count(_.numInputRows > 0) >= 8,
        s"expected >=8 data batches, got ${progress.length}")
      // exact dedup: every id exactly once despite 50% redelivery
      val out = spark.table("soak_out")
      assert(out.count() == 8L * perBatch)
      assert(out.select("gtid").distinct().count() == 8L * perBatch)
      // RocksDB engaged and state bounded: keys in state never exceed
      // the live id universe (watermark evicts as time advances)
      val stateOps = progress.flatMap(_.stateOperators)
      assert(stateOps.exists(_.customMetrics.containsKey("rocksdbGetCount")),
        "RocksDB provider not engaged")
      val maxStateRows = stateOps.map(_.numRowsTotal).max
      assert(maxStateRows <= 8L * perBatch,
        s"state grew past the key universe: $maxStateRows")
      assert(maxStateRows > 0)
    } finally q.stop()
  }

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try super.withFixture(test)
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
