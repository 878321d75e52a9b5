package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CdcOps
import graft.sources.DebeziumEnvelope
import graft.streaming.LakehouseSink

/** End-to-end CDC→lakehouse pipeline over Debezium-format wire JSON:
  *
  * {{{
  * Debezium envelopes (JSON strings — in production a Kafka topic)
  *   → DebeziumEnvelope.parse (declared payload schema)
  *   → toGraftEnvelope (op taxonomy, provenance, content)
  *   → dropSkipped
  *   → CdcOps.typedUpdateView (typed before/after columns back out)
  *   → LakehouseSink.startBucketedStream (bucketed table, _batch_id)
  *   → no-Exchange readback aggregation on the bucket key
  * }}}
  *
  * Usage: sbt "runMain graft.examples.CdcLakehouseDemo"
  */
object CdcLakehouseDemo {
  def main(args: Array[String]): Unit = {
    val work = Files.createTempDirectory("graft-lakehouse").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-cdc-lakehouse")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // fresh per-run warehouse so the managed bronze table (and
      // reruns of the demo) never collide with an old location
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))

    // synthesize a Debezium topic: inserts, updates, deletes, noise
    def src(gtid: Long) =
      s""""source":{"connector":"mysql","name":"srv1","db":"shop",
          "table":"orders","gtid":"uuid:$gtid"}"""
        .replaceAll("\n\\s*", "")
    val wire = (0 until 3000).map { i =>
      val id = i % 500
      i % 10 match {
        case 0 => s"""{"before":{"id":$id,"qty":${i - 10}},"after":null,${src(i)},"op":"d","ts_ms":$i}"""
        case 1 => s"""{"before":null,"after":null,${src(i)},"op":"t","ts_ms":$i}"""
        case n if n % 3 == 0 =>
          s"""{"before":{"id":$id,"qty":${i - 1}},"after":{"id":$id,"qty":$i},${src(i)},"op":"u","ts_ms":$i}"""
        case _ => s"""{"before":null,"after":{"id":$id,"qty":$i},${src(i)},"op":"c","ts_ms":$i}"""
      }
    }
    val topicDir = s"$work/topic"
    wire.toDF("value").repartition(3).write.text(topicDir)

    // stream the topic (file stream stands in for the Kafka reader —
    // everything downstream is transport-agnostic)
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", "1")
      .text(topicDir)
    val envelopes = CdcOps.dropSkipped(
      DebeziumEnvelope.toGraftEnvelope(
        DebeziumEnvelope.parse(raw, payload)))
    val typed = CdcOps.typedUpdateView(envelopes, payload)
      .select($"event_type", $"gtid", $"database", $"table", $"ts_ms",
        $"before.id".as("before_id"), $"before.qty".as("before_qty"),
        $"after.id".as("after_id"), $"after.qty".as("after_qty"),
        coalesce($"after.id", $"before.id").as("row_id"))

    val t0 = System.nanoTime()
    val q = LakehouseSink.startBucketedStream(typed, "demo_cdc_bronze",
      bucketCol = "row_id", buckets = 8, partitionCols = Seq("event_type"),
      checkpointDir = s"$work/ckpt")
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val bronze = spark.table("demo_cdc_bronze")
    val latest = bronze.groupBy($"row_id")
      .agg(max($"ts_ms").as("last_change"), count(lit(1)).as("n_changes"))
    val plan = latest.queryExecution.executedPlan.toString
    println(s"[lakehouse] wire messages:    ${wire.size}")
    println(s"[lakehouse] bronze rows:      ${bronze.count()} (noise dropped)")
    println(s"[lakehouse] micro-batches:    " +
      bronze.select("_batch_id").distinct().count())
    println(s"[lakehouse] typed updates:    " +
      bronze.filter($"event_type" === "Update" &&
        $"after_qty" === $"before_qty" + 1).count() + " qty+1 changes")
    println(s"[lakehouse] rows tracked:     ${latest.count()}")
    println(s"[lakehouse] readback shuffle: " +
      (if (plan.contains("Exchange")) "EXCHANGE (bad)" else "none (bucketed)"))
    println(f"[lakehouse] wall: $secs%.1f s")

    // silver: the SAME envelope stream merged into a latest-state
    // table with a per-bucket aggregate maintained incrementally
    // (CdcMerge + IncrementalAgg) — the consumer layer the bronze
    // append feeds in a real deployment
    val silverIn = typed
      .withColumn("qty_bucket",
        when(coalesce($"after_qty", lit(0L)) >= 2750L, "big")
          .otherwise("small"))
      .withColumn("value", coalesce($"after_qty", lit(0L)).cast("double"))
    val q2 = silverIn.writeStream
      .option("checkpointLocation", s"$work/ckpt-silver")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.streaming.IncrementalAgg.applyBatch(batch.sparkSession,
          "demo_cdc_silver", "demo_cdc_agg", batch, "row_id",
          Seq("ts_ms", "gtid"), nBuckets = 8, groupCol = "qty_bucket",
          valueCol = "value", batchId = id)
        ()
      }.start()
    q2.awaitTermination()
    val live = graft.streaming.CdcMerge.readState(spark, "demo_cdc_silver")
    println(s"[lakehouse] silver live rows:  ${live.count()} " +
      s"(deletes tombstoned: " +
      spark.table("demo_cdc_silver")
        .filter($"event_type" === "Delete").count() + ")")
    graft.streaming.IncrementalAgg.readAgg(spark, "demo_cdc_agg")
      .orderBy($"qty_bucket").collect().foreach { r =>
        println(s"[lakehouse] agg ${r.getAs[String]("qty_bucket")}: " +
          s"n_live=${r.getAs[Long]("n_live")} " +
          s"sum=${r.getAs[java.math.BigDecimal]("sum_value")}")
      }

    // gold: the SAME stream merged WITH a change-data-feed — every
    // commit's row-level diff lands in a _commit-partitioned journal;
    // downstream views tail the feed (never the state table), and any
    // commit's state is reconstructable after the fact
    val q3 = graft.streaming.ChangeFeed.startMergeStream(
      typed.withColumn("value",
        coalesce($"after_qty", lit(0L)).cast("double")),
      "demo_cdc_gold", "demo_cdc_feed", "row_id", Seq("ts_ms", "gtid"),
      nBuckets = 8, checkpointDir = s"$work/ckpt-gold")
    q3.awaitTermination()
    val feed = spark.table("demo_cdc_feed")
    val lastCommit = feed.agg(max($"_commit")).collect()(0).getLong(0)
    println(s"[lakehouse] feed commits:     ${lastCommit + 1}, " +
      s"changes by type: " +
      feed.groupBy($"_change_type").count().orderBy($"_change_type")
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", "))
    // point-in-time: state as of the mid-stream commit vs now
    val midCommit = lastCommit / 2
    val asOfMid = graft.streaming.ChangeFeed.stateAsOf(spark,
      "demo_cdc_feed", "row_id", midCommit).count()
    val asOfNow = graft.streaming.ChangeFeed.stateAsOf(spark,
      "demo_cdc_feed", "row_id", lastCommit).count()
    val goldLive = graft.streaming.CdcMerge
      .readState(spark, "demo_cdc_gold").count()
    println(s"[lakehouse] stateAsOf($midCommit): $asOfMid rows; " +
      s"stateAsOf($lastCommit): $asOfNow vs live $goldLive" +
      (if (asOfNow == goldLive) " (journal complete)" else " (MISMATCH!)"))
    // a decoupled consumer materializes its own view by polling the
    // feed — here in two overlapping polls to show watermark exactness
    def poll(upTo: Long): Unit =
      graft.streaming.ChangeFeed.applyFeedToAggregate(spark,
        "demo_cdc_feed", "demo_cdc_feed_view",
        when($"value" >= 2750.0, "big").otherwise("small"), "value",
        upTo)
    poll(midCommit); poll(Long.MaxValue); poll(Long.MaxValue)
    graft.streaming.ChangeFeed.readAggregate(spark, "demo_cdc_feed_view")
      .orderBy($"g").collect().foreach { r =>
        println(s"[lakehouse] feed view ${r.getString(0)}: " +
          s"n_live=${r.getAs[Long]("n_live")} " +
          s"sum=${r.getAs[java.math.BigDecimal]("sum_value")}")
      }

    // table service: the silver table has outgrown its 8 buckets —
    // re-partition it to 32 between merge windows; state must read
    // back identically
    val liveBefore = live.count()
    graft.streaming.CdcMerge.rebucket(spark, "demo_cdc_silver",
      "row_id", newBuckets = 32)
    val liveAfter = graft.streaming.CdcMerge
      .readState(spark, "demo_cdc_silver").count()
    println(s"[lakehouse] rebucket 8->32:   " +
      spark.table("demo_cdc_silver").select("_kb").distinct().count() +
      s" partitions, live rows $liveBefore -> $liveAfter" +
      (if (liveBefore == liveAfter) " (preserved)" else " (LOST!)"))
    spark.stop()
  }
}
