package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReplaySourceSpec extends SparkSpec {

  test("graft-replay: ordered resumable replay with admission control") {
    val out = "replay_out"
    val q = spark.readStream.format("graft-replay")
      .option("path", sf("sf0.001") + "/events.parquet")
      .option("maxEventsPerTrigger", "200")
      .load()
      .writeStream.format("memory").queryName(out)
      .option("checkpointLocation", tmpDir("replay-ck"))
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    q.stop()
    val got = spark.table(out)
    assert(got.count() == 1000)
    // admission control: no micro-batch exceeded the cap
    assert(batches.nonEmpty && batches.forall(_ <= 200))
    assert(batches.length >= 5)
    // every event exactly once, schema faithful
    assert(got.select("event_id").distinct().count() == 1000)
    assert(got.schema == ReplaySource.schema)
    // timestamps arrived as proper micros (same values Tables.load sees)
    val expect = Tables.load(spark, sf("sf0.001"), "events")
      .agg(max(unix_millis(col("ts")))).collect()(0).getLong(0)
    assert(got.agg(max(unix_millis(col("ts")))).collect()(0)
      .getLong(0) == expect)
  }

  test("graft-replay: Trigger.AvailableNow drains ALL batches") {
    // regression: without SupportsTriggerAvailableNow, Spark's wrapper
    // took the first rate-limited offset as the drain target and
    // stopped after ONE batch (only maxEventsPerTrigger rows delivered)
    val out = "replay_an"
    val q = spark.readStream.format("graft-replay")
      .option("path", sf("sf0.001") + "/events.parquet")
      .option("maxEventsPerTrigger", "150")
      .load()
      .writeStream.format("memory").queryName(out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("replay-an-ck"))
      .start()
    q.awaitTermination()
    assert(spark.table(out).count() == 1000)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.length >= 7) // 1000 rows / 150-cap → ≥7 micro-batches
    assert(batches.forall(_ <= 150))
  }

  test("graft-replay: resume from checkpoint delivers nothing twice") {
    val src = tmpDir("replay-src")
    Tables.load(spark, sf("sf0.001"), "events").repartition(3)
      .write.mode("overwrite").parquet(src)
    val ckpt = tmpDir("replay-ck2")
    val out = tmpDir("replay-out")
    def run(): Long = {
      val q = spark.readStream.format("graft-replay")
        .option("path", src).option("maxEventsPerTrigger", "300")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
      spark.read.parquet(out).count()
    }
    assert(run() == 1000)
    // second run from the same checkpoint: offset is at max -> 0 new rows
    assert(run() == 1000)
    assert(spark.read.parquet(out).select("event_id").distinct()
      .count() == 1000)
  }
}
