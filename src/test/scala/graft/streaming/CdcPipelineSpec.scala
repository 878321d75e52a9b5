package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CdcOps
import graft.sources.Tables

/** End-to-end streaming pipeline tests mirroring the reference's e2e
  * harness scenarios (SURVEY.md §5 tier 3) on the bounded replay source:
  * full drain, at-least-once resume, position mirror, sink batch shape.
  */
class CdcPipelineSpec extends SparkSpec {

  /** Stage the sf0.001 events table as a clean parquet dir (micros ts). */
  private def stageSource(): String = {
    val dir = tmpDir("graft-src")
    Tables.load(spark, sf("sf0.001"), "events")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def readSinkLines(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".jsonl"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("pipeline drains the replay source into packed sink batches") {
    val src = stageSource()
    val sinkDir = tmpDir("graft-sink")
    val ckpt = tmpDir("graft-ckpt")
    val posDir = tmpDir("graft-pos")

    val store = new FilePositionStore(posDir)
    val listener = new PositionListener(store, "parquet-replay", src)
    spark.streams.addListener(listener)
    try {
      val q = CdcPipeline.start(spark, CdcPipeline.Config(
        sourceDir = src,
        sinkConf = Map("dir" -> sinkDir),
        checkpointDir = ckpt,
        availableNow = true))
      q.awaitTermination()

      val lines = readSinkLines(sinkDir)
      val expected = Tables.load(spark, sf("sf0.001"), "events")
        .filter(CdcOps.classifyOp(col("event_type")) =!= "Skip").count()
      assert(lines.size == expected)
      assert(lines.forall(_.contains("\"oversized\":false")))
      // position mirror captured the committed end offset
      assert(store.read("parquet-replay", src).isDefined)
    } finally spark.streams.removeListener(listener)
  }

  test("debezium-text source: wire JSON drains through the full pipeline") {
    import spark.implicits._
    val src = tmpDir("dbz-src")
    def sblock(g: Int) =
      s""""source":{"connector":"mysql","name":"s1","db":"shop","table":"t","gtid":"uuid:$g"}"""
    val wire = (0 until 100).map { i =>
      i % 5 match {
        case 0 => s"""{"before":null,"after":null,${sblock(i)},"op":"t","ts_ms":${1700000000000L + i}}"""
        case 1 => s"""{"before":{"k":${i - 1}},"after":null,${sblock(i)},"op":"d","ts_ms":${1700000000000L + i}}"""
        case _ => s"""{"before":null,"after":{"k":$i},${sblock(i)},"op":"c","ts_ms":${1700000000000L + i}}"""
      }
    }
    wire.toDF("value").coalesce(1).write.mode("overwrite").text(src)

    val sinkDir = tmpDir("dbz-sink")
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      sourceDir = src,
      sourceFormat = "debezium-text",
      sinkConf = Map("dir" -> sinkDir),
      checkpointDir = tmpDir("dbz-ckpt"),
      availableNow = true))
    q.awaitTermination()

    val lines = readSinkLines(sinkDir)
    assert(lines.size == 80) // 20 op="t" noise rows dropped
    assert(lines.forall(_.contains(""""source":"stream_cdc"""")))
    assert(lines.count(_.contains(""""event_type":"Delete"""")) == 20)
    assert(lines.count(_.contains(""""event_type":"Insert"""")) == 60)
    // gtid provenance rides through to the sink id
    assert(lines.forall(_.contains(""""id":"uuid:""")))
    // watermarked streaming dedup composes with the debezium source
    val dedup = CdcPipeline.dedupStream(spark, CdcPipeline.Config(
      sourceDir = src, sourceFormat = "debezium-text",
      checkpointDir = tmpDir("dbz-ck2")))
    val q2 = dedup.writeStream.format("memory").queryName("dbz_dedup")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dbz-ck3")).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("dbz_dedup").count() == 80)
  }

  test("resume from checkpoint is at-least-once with no loss") {
    val src = stageSource()
    val sinkDir = tmpDir("graft-sink2")
    val ckpt = tmpDir("graft-ckpt2")

    def run(): Unit = {
      val q = CdcPipeline.start(spark, CdcPipeline.Config(
        sourceDir = src,
        sinkConf = Map("dir" -> sinkDir),
        checkpointDir = ckpt,
        availableNow = true))
      q.awaitTermination()
    }
    run()
    val afterFirst = readSinkLines(sinkDir).size

    // new files arrive while the query is down
    Tables.load(spark, sf("sf0.001"), "events")
      .withColumn("event_id", col("event_id") + 1000000L)
      .coalesce(1).write.mode("append").parquet(src)
    run()

    val lines = readSinkLines(sinkDir)
    val perSource = Tables.load(spark, sf("sf0.001"), "events")
      .filter(CdcOps.classifyOp(col("event_type")) =!= "Skip").count()
    // no loss (exactly the new delta was delivered; none of the old
    // batch replayed because the checkpoint committed)
    assert(afterFirst == perSource)
    assert(lines.size == 2 * perSource)
    val ids = lines.flatMap(l =>
      """"id":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
    assert(ids.distinct.size == ids.size)
  }

  test("filter chain applies inside the streaming plan") {
    val src = stageSource()
    val sinkDir = tmpDir("graft-sink3")
    val ckpt = tmpDir("graft-ckpt3")
    val chain = CdcOps.FilterChain.of(
      _.filter(col("event_type") === "Insert"))
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      sourceDir = src,
      sinkConf = Map("dir" -> sinkDir),
      checkpointDir = ckpt,
      chain = chain,
      availableNow = true))
    q.awaitTermination()
    val lines = readSinkLines(sinkDir)
    assert(lines.nonEmpty)
    assert(lines.forall(_.contains("\"event_type\":\"Insert\"")))
  }

  test("streaming dedup within watermark and windowed agg run") {
    val src = stageSource()
    val cfg = CdcPipeline.Config(sourceDir = src, checkpointDir = tmpDir("c"),
      sinkConf = Map.empty)
    val dedup = CdcPipeline.dedupStream(spark, cfg)
    val q1 = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-ck-d")).start()
    q1.processAllAvailable(); q1.stop()
    val n = spark.table("dedup_out").count()
    assert(n > 0)

    val win = CdcPipeline.windowedCounts(spark, cfg)
    val q2 = win.writeStream.format("memory").queryName("win_out")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ck-w")).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("win_out").count() > 0)
  }

  test("pipeline runs end-to-end over the custom graft-replay source") {
    val src = stageSource()
    val sinkDir = tmpDir("graft-sink-r")
    val q = CdcPipeline.start(spark, CdcPipeline.Config(
      sourceDir = src,
      sourceFormat = "graft-replay",
      sinkConf = Map("dir" -> sinkDir),
      checkpointDir = tmpDir("graft-ckpt-r"),
      availableNow = true))
    q.awaitTermination()
    val expected = Tables.load(spark, sf("sf0.001"), "events")
      .filter(CdcOps.classifyOp(col("event_type")) =!= "Skip").count()
    assert(readSinkLines(sinkDir).size == expected)
  }

  test("materializeLatestState: source dir to queryable state table") {
    val src = stageSource()
    CdcMerge.dropStateTable(spark, "pipe_state")
    CdcMerge.dropStateTable(spark, "pipe_state_stage")
    val q = CdcPipeline.materializeLatestState(spark,
      CdcPipeline.Config(
        sourceDir = src,
        sourceFormat = "graft-replay",
        checkpointDir = tmpDir("graft-ckpt-m"),
        availableNow = true),
      table = "pipe_state", nBuckets = 8)
    q.awaitTermination()
    // converged state = batch latest-state over non-skip events, with
    // users whose LAST event classifies Delete absent
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = Tables.load(spark, sf("sf0.001"), "events")
      .withColumn("op", CdcOps.classifyOp(col("event_type")))
      .filter(col("op") =!= "Skip")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "Delete")
      .select(col("user_id"), col("event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = CdcMerge.readState(spark, "pipe_state")
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("parquet file sink is exactly-once across restart") {
    val src = stageSource()
    val out = tmpDir("graft-pq-out")
    val ckpt = tmpDir("graft-pq-ckpt")
    def run(): Unit = {
      val q = CdcPipeline.startParquetSink(spark, CdcPipeline.Config(
        sourceDir = src, checkpointDir = ckpt, availableNow = true), out)
      q.awaitTermination()
    }
    run()
    val expected = Tables.load(spark, sf("sf0.001"), "events")
      .filter(CdcOps.classifyOp(col("event_type")) =!= "Skip").count()
    assert(spark.read.parquet(out).count() == expected)
    run() // restart with no new data: exactly-once -> nothing new
    assert(spark.read.parquet(out).count() == expected)
    val gtids = spark.read.parquet(out).select("gtid").distinct().count()
    assert(gtids == expected)
  }

  test("stateful mapGroupsWithState: running totals match batch agg") {
    import spark.implicits._
    val src = stageSource()
    val cfg = CdcPipeline.Config(sourceDir = src, checkpointDir = tmpDir("c"),
      sinkConf = Map.empty)
    val q = CdcPipeline.statefulUserTotals(spark, cfg)
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-ck-s")).start()
    q.processAllAvailable(); q.stop()
    // latest state per user must equal the batch-side counts
    val last = spark.table("state_out")
      .groupBy($"user_id").agg(max($"n_events").as("n"))
    val expected = CdcPipeline.envelopeStream(spark, cfg)
      // batch twin of the same plan
      .sparkSession.read.parquet(src)
      .filter(graft.operators.CdcOps.classifyOp(col("event_type")) =!= "Skip")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    assert(last.join(expected, Seq("user_id"))
      .filter(last("n") =!= expected("n")).count() == 0)
    assert(last.count() == expected.count())
  }

  test("stream-static enrichment joins the broadcast dimension") {
    import spark.implicits._
    val src = stageSource()
    val cfg = CdcPipeline.Config(sourceDir = src, checkpointDir = tmpDir("c"),
      sinkConf = Map.empty)
    val dim = (0L until 200L).map(u => (u, s"segment-${u % 4}"))
      .toDF("user_id", "segment")
    val q = CdcPipeline.enrichedStream(spark, cfg, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .option("checkpointLocation", tmpDir("graft-ck-e")).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out")
    assert(out.count() > 0)
    assert(out.filter($"segment".isNull).count() == 0)
    assert(out.select("segment").distinct().count() == 4)
  }

  test("stream-stream join with watermarks equals the batch join") {
    import spark.implicits._
    val src = stageSource()
    val cfg = CdcPipeline.Config(sourceDir = src, checkpointDir = tmpDir("c"),
      sinkConf = Map.empty)
    val q = CdcPipeline.purchaseErrorJoin(spark, cfg)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-ck-ss")).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_out")
      .select($"p_id", $"e_id").orderBy($"p_id", $"e_id").collect()

    val batchEnv = spark.read.parquet(src)
      .withColumn("op", graft.operators.CdcOps.classifyOp(col("event_type")))
    val p = batchEnv.filter($"op" === "Insert")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val e = batchEnv.filter($"op" === "Delete")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
    val batch = p.join(e, $"p_user" === $"e_user" &&
        $"e_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
        $"e_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"))
      .select($"p_id", $"e_id").orderBy($"p_id", $"e_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("flatMapGroupsWithState change detector emits rising maxima only") {
    import spark.implicits._
    val src = stageSource()
    val cfg = CdcPipeline.Config(sourceDir = src, checkpointDir = tmpDir("c"),
      sinkConf = Map.empty)
    val q = CdcPipeline.valueJumpDetector(spark, cfg)
      .writeStream.format("memory").queryName("jump_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-ck-j")).start()
    q.processAllAvailable(); q.stop()
    val jumps = spark.table("jump_out")
    assert(jumps.count() > 0)
    // per user: emitted maxima strictly increase, final equals batch max
    val perUser = jumps.orderBy($"user_id", $"event_id").collect()
      .groupBy(_.getAs[Long]("user_id"))
    perUser.values.foreach { rows =>
      val vs = rows.map(_.getAs[Double]("new_max")).toSeq
      assert(vs == vs.sorted && vs.distinct == vs)
    }
    val finalMax = jumps.groupBy($"user_id")
      .agg(max($"new_max").as("m"))
    val batchMax = CdcPipeline.envelopeStream(spark, cfg)
      .sparkSession.read.parquet(src)
      .filter(graft.operators.CdcOps.classifyOp(col("event_type")) =!= "Skip")
      .groupBy($"user_id").agg(max($"value").as("m"))
    assert(finalMax.join(batchMax, Seq("user_id"))
      .filter(finalMax("m") =!= batchMax("m")).count() == 0)
  }

  test("component registry: case-insensitive lookup, error on unknown") {
    assert(QueueSinkRegistry.registry.registered.contains("file"))
    val s = QueueSinkRegistry.create("FILE", Map("dir" -> tmpDir("q")))
    assert(s.isInstanceOf[LocalFileQueue])
    intercept[UnsupportedTypeError] {
      QueueSinkRegistry.create("kafka", Map.empty)
    }
  }
}
