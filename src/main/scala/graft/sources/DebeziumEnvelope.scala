package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-format envelope support — the documented production path
  * for Kafka CDC feeds (SURVEY §2.1 S1; the reference's live binlog
  * tail `/root/reference/stream_cdc/datasources/mysql.py:367-402`
  * produces the same before/after/source/op shape Debezium publishes).
  *
  * This sandbox has no Kafka broker, so the transform is broker-less
  * by design: it takes ANY DataFrame with a JSON string column — in
  * production `spark.readStream.format("kafka")`'s `value` cast to
  * string, in tests a literal DataFrame — and parses it with a
  * declared schema. Nothing else changes between the two, which is the
  * point: the envelope contract, not the transport, is the interface.
  *
  * Wire compatibility: field names and nesting follow the public
  * Debezium MySQL connector event shape (schema-less JSON converter):
  * `before`, `after` (payload-typed, nullable), `source` {version,
  * connector, name, ts_ms, snapshot, db, table, server_id, gtid, file,
  * pos, row}, `op` (c/u/d/r), `ts_ms`. Unknown extra fields are
  * ignored by `from_json`; absent fields surface as nulls — both are
  * what a versioned envelope needs.
  */
object DebeziumEnvelope {

  /** Source-block schema (connector-populated provenance). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("server_id", LongType),
    StructField("gtid", StringType),
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("row", IntegerType)))

  /** Full envelope schema for a given row-payload schema. */
  def schema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Parse a JSON string column into an `envelope` struct column. */
  def parse(raw: DataFrame, payload: StructType,
      jsonCol: String = "value"): DataFrame =
    raw.withColumn("envelope", from_json(col(jsonCol), schema(payload)))

  /** Debezium op → the reference's operation taxonomy: c(reate) and
    * r(ead, snapshot) are Inserts, u → Update, d → Delete; anything
    * else (schema-change topics, truncates) classifies as Skip exactly
    * like QueryEvents in `mysql.py:387-389`. */
  def opToEventType(op: Column): Column =
    when(op === "c" || op === "r", "Insert")
      .when(op === "u", "Update")
      .when(op === "d", "Delete")
      .otherwise("Skip")

  /** Project a parsed envelope onto the graft CDC envelope columns
    * (the same shape `CdcOps.toEnvelope` emits from the replay
    * source): event_type, gtid, database, table, content. Content
    * re-serializes the before/after pair so downstream consumers
    * (`CdcOps.typedUpdateView`, sinks) are transport-agnostic. */
  def toGraftEnvelope(parsed: DataFrame): DataFrame =
    parsed.select(
      opToEventType(col("envelope.op")).as("event_type"),
      col("envelope.source.gtid").as("gtid"),
      col("envelope.source.db").as("database"),
      col("envelope.source.table").as("table"),
      to_json(struct(
        col("envelope.before").as("before"),
        col("envelope.after").as("after"))).as("content"),
      col("envelope.ts_ms").as("ts_ms"))
}
