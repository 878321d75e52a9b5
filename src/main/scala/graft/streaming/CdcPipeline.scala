package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.CdcOps

/** The assembled CDC pipeline — the reference's
  * `Worker → Coordinator → {source, processor, policy, sink, state}`
  * object graph (`stream_cdc/main.py:16-66`) as one Structured Streaming
  * query:
  *
  * {{{
  * readStream(parquet replay)            // S1  source scan
  *   → toEnvelope → dropSkipped → chain  // O1-O9 processing
  *   → trigger(FlushPolicy)              // O10/O11 micro-batch + flush
  *   → foreachBatch → per-partition      // O12-O15 pack + claim-check
  *        prepare|pack|send(QueueSink)   //        + split-retry
  *   → checkpointLocation                // O16/O17 at-least-once commit
  * }}}
  *
  * Scale design: the sink path runs in `foreachPartition` — one
  * QueueSink client per executor task, iterator-based packing (no
  * partition materialization), so sink fan-out grows with the cluster.
  * The driver never sees event data.
  */
object CdcPipeline {

  /** Schema of the bounded/streaming events replay source
    * (TESTDATA.md; ts already normalized to micros by Tables.load). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Config(
      sourceDir: String,
      sourceFormat: String = "parquet", // "graft-replay" | "debezium-text"
      sinkType: String = "file",
      sinkConf: Map[String, String] = Map.empty,
      checkpointDir: String,
      policy: FlushPolicy = FlushPolicy(),
      chain: CdcOps.FilterChain = CdcOps.FilterChain.identity,
      availableNow: Boolean = false,
      // payload schema for the debezium-text source (row shape of
      // before/after images)
      debeziumPayload: StructType = StructType(Seq(
        StructField("k", LongType))))

  /** Build the streaming envelope DataFrame (source + processing).
    * "parquet" uses Spark's file source (rate-capped by files);
    * "graft-replay" uses the custom DSv2 source with event_id offsets
    * and row-level admission control ([[graft.sources.ReplaySource]]);
    * "debezium-text" consumes Debezium-format wire JSON (one envelope
    * per line — the file stream stands in for a Kafka reader; the
    * parse/projection is transport-agnostic,
    * [[graft.sources.DebeziumEnvelope]]).
    */
  def envelopeStream(spark: SparkSession, cfg: Config): DataFrame = {
    cfg.sourceFormat match {
      case "graft-replay" =>
        val raw = spark.readStream.format("graft-replay")
          .option("path", cfg.sourceDir)
          .option("maxEventsPerTrigger",
            (cfg.policy.batchSize.toLong * 100).toString)
          .load()
        cfg.chain(CdcOps.dropSkipped(CdcOps.toEnvelope(raw)))
      case "debezium-text" =>
        var reader = spark.readStream
          .schema(StructType(Seq(StructField("value", StringType))))
        cfg.policy.sourceOptions.foreach { case (k, v) =>
          reader = reader.option(k, v)
        }
        val wire = reader.text(cfg.sourceDir)
        val env = graft.sources.DebeziumEnvelope.toGraftEnvelope(
          graft.sources.DebeziumEnvelope.parse(wire, cfg.debeziumPayload))
          // align with the replay envelope column contract: an
          // event-time ts for watermarks/windows; source fields the
          // wire doesn't carry surface as typed nulls
          .withColumn("ts", timestamp_millis(col("ts_ms")))
          .withColumn("event_id", lit(null).cast(LongType))
          .withColumn("user_id", lit(null).cast(LongType))
          .withColumn("value", lit(null).cast(DoubleType))
        cfg.chain(CdcOps.dropSkipped(env))
      case _ =>
        var reader = spark.readStream.schema(eventsSchema)
        cfg.policy.sourceOptions.foreach { case (k, v) =>
          reader = reader.option(k, v)
        }
        val raw = reader.parquet(cfg.sourceDir)
        cfg.chain(CdcOps.dropSkipped(CdcOps.toEnvelope(raw)))
    }
  }

  /** The consumer-side completion of the pipeline: the same envelope
    * stream the queue sink forwards, merged instead into a
    * continuously-maintained latest-state table ([[CdcMerge]] —
    * tombstoned deletes, idempotent under the pipeline's at-least-once
    * replay). One call takes a source directory to a queryable state
    * table, which is what a reference user ultimately deploys the
    * forwarder FOR. */
  def materializeLatestState(spark: SparkSession, cfg: Config,
      table: String, nBuckets: Int = 64,
      keyCol: String = "user_id",
      versionCols: Seq[String] = Seq("ts", "event_id"))
      : StreamingQuery =
    CdcMerge.startMergeStream(envelopeStream(spark, cfg), table,
      keyCol, versionCols, nBuckets, cfg.checkpointDir,
      availableNow = cfg.availableNow)

  /** Start the full pipeline. At-least-once end to end: Spark commits
    * the sink (foreachBatch) before the offset WAL, duplicates possible
    * on crash-between — identical guarantee to the reference's
    * send-then-save_state ordering (`coordinator.py:281-303`).
    */
  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val env = envelopeStream(spark, cfg)
    // resolve the sink factory ON THE DRIVER and capture the function:
    // executor JVMs have their own registry instance holding only the
    // built-ins, so a by-name lookup there would miss user-registered
    // sinks (and an unknown sink should fail at start, not per-task)
    val makeSink = QueueSinkRegistry.registry.factoryFor(cfg.sinkType)
    val sinkConf = cfg.sinkConf

    val writer = env
      .select(col("gtid").as("id"),
        to_json(struct(col("event_type"), col("gtid"), col("database"),
          col("table"), col("content"))).as("body"),
        col("event_type"), col("database"), col("table"))
      .writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        batch
          .select($"id", $"body", $"event_type", $"database", $"table")
          .as[(String, String, String, String, String)]
          .foreachPartition {
            it: Iterator[(String, String, String, String, String)] =>
              val sink = makeSink(sinkConf)
              try {
                val entries = it.map { case (id, body, et, db, tbl) =>
                  BatchPacker.prepare(id, body, Map(
                    "event_type" -> et, "database" -> db, "table" -> tbl,
                    "id" -> id))
                }
                val failures = BatchPacker.packAndSend(entries, sink.send)
                failures.foreach(f => System.err.println(
                  s"[graft.sink] entry ${f.id} failed: ${f.code}"))
              } finally sink.close()
          }
        ()
      }

    val triggered =
      if (cfg.availableNow) writer.trigger(Trigger.AvailableNow())
      else writer.trigger(cfg.policy.trigger)
    triggered.start()
  }

  /** Streaming exact-dedup within a watermark — the scale-safe form of
    * `dropDuplicates` (bounded state; SURVEY.md §7.4.6). */
  def dedupStream(spark: SparkSession, cfg: Config,
      watermark: String = "1 hour"): DataFrame =
    envelopeStream(spark, cfg)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("gtid")

  /** Streaming tumbling-window aggregation with watermark + late-data
    * drop — the streaming twin of cdc05_tumbling_window. */
  def windowedCounts(spark: SparkSession, cfg: Config,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    envelopeStream(spark, cfg)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming session windows: gap-based per-user sessions with
    * watermark-bounded state — the streaming twin of cdc14 (and of the
    * batch sessionize cdc06). A session closes (emits, evicts) once
    * the watermark passes its gap-extended end; state per live session
    * is O(1). */
  def sessionCounts(spark: SparkSession, cfg: Config,
      gap: String = "24 hours", watermark: String = "2 hours"): DataFrame =
    envelopeStream(spark, cfg)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))

  /** File-sink variant: same envelope pipeline into a transactional
    * parquet sink. Unlike the queue path (at-least-once, matching the
    * reference), Spark's file sink commits atomically with the offset
    * log → EXACTLY-once (SURVEY.md §7.4.2: "exceed it with file
    * sinks"). This is the path a 100 TB lakehouse ingestion would use.
    */
  def startParquetSink(spark: SparkSession, cfg: Config,
      outDir: String): StreamingQuery = {
    val writer = envelopeStream(spark, cfg)
      .select(col("event_type"), col("gtid"), col("database"),
        col("table"), col("content"), col("ts"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cfg.checkpointDir)
    val triggered =
      if (cfg.availableNow) writer.trigger(Trigger.AvailableNow())
      else writer.trigger(cfg.policy.trigger)
    triggered.start()
  }

  /** Stream-static enrichment: the envelope stream joins a broadcast
    * dimension (re-read per micro-batch, so slowly-changing dims pick
    * up updates). At 100 TB the dim side stays a broadcast as long as
    * it fits executor memory; beyond that, pre-bucket both sides. */
  def enrichedStream(spark: SparkSession, cfg: Config,
      dim: DataFrame, key: String = "user_id"): DataFrame =
    envelopeStream(spark, cfg)
      .join(org.apache.spark.sql.functions.broadcast(dim), key)

  /** Watermarked stream-stream inner join: purchases matched to error
    * events of the same user within ±1 hour of event time. Watermarks
    * bound the join state on BOTH sides — without them this state grows
    * forever; with them expired rows are evicted once the watermark
    * passes the join window. */
  def purchaseErrorJoin(spark: SparkSession, cfg: Config): DataFrame = {
    val env = envelopeStream(spark, cfg)
    val purchases = env.filter(col("event_type") === "Insert")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "2 hours")
    val errors = env.filter(col("event_type") === "Delete")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", "2 hours")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
  }

  final case class ValueJump(user_id: Long, event_id: Long,
      new_max: Double)

  /** `flatMapGroupsWithState` variant (0..n outputs per group per
    * batch): emits a record only when a user's running max value rises —
    * the change-detection shape (threshold alerts, new-high-watermark
    * triggers) that windowed aggregates can't express. */
  def valueJumpDetector(spark: SparkSession, cfg: Config)
      : org.apache.spark.sql.Dataset[ValueJump] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    envelopeStream(spark, cfg)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, ValueJump](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (k, rows, state) =>
        var mx = state.getOption.getOrElse(Double.NegativeInfinity)
        val jumps = rows.toSeq.sortBy(_._2).flatMap { case (_, id, v) =>
          if (v > mx) { mx = v; Some(ValueJump(k, id, v)) } else None
        }
        state.update(mx)
        jumps.iterator
      }
  }

  /** Spark 4 `transformWithState` version of the running totals — the
    * modern arbitrary-state API (typed ValueState handles, per-state
    * TTL support, RocksDB-native layout) that supersedes
    * mapGroupsWithState. Kept alongside the classic version so both
    * extension surfaces are covered. */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), UserTotals] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var (c, v) = Option(state.get()).getOrElse((0L, 0.0))
      rows.foreach { case (_, value) => c += 1; v += value }
      state.update((c, v))
      Iterator.single(UserTotals(key, c, v))
    }
  }

  /** transformWithState wiring (requires the RocksDB state store). */
  def statefulUserTotalsTws(spark: SparkSession, cfg: Config)
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    envelopeStream(spark, cfg)
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class UserTotals(user_id: Long, n_events: Long,
      total_value: Double)

  /** Custom stateful streaming op via `mapGroupsWithState`: running
    * per-user totals maintained across micro-batches — the extension
    * point for state the built-in aggregations can't express
    * (SURVEY.md §2.2 UDF/UDAF surface). State is per-key and O(1);
    * at 100 TB it lives in RocksDB with watermark-based expiry. */
  def statefulUserTotals(spark: SparkSession, cfg: Config)
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    envelopeStream(spark, cfg)
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserTotals](
        GroupStateTimeout.NoTimeout) { (k, rows, state) =>
        var (c, v) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { case (_, value) => c += 1; v += value }
        state.update((c, v))
        UserTotals(k, c, v)
      }
  }
}
