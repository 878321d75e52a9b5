package graft.model

import org.apache.spark.sql.types._

/** The engine's canonical change-event envelope.
  *
  * Mirrors the reference's event dict (reference
  * `stream_cdc/datasources/mysql.py:416-426`, `_create_event_dict`):
  * `{event_type, gtid, database, table, content}`. The schema-less
  * `content` payload is kept as a raw JSON string for fidelity
  * (SURVEY.md §1.4) — consumers project typed views with `from_json`
  * when they declare a schema.
  *
  * @param event_type "Insert" | "Update" | "Delete"
  *                   (reference `mysql.py:344-352`)
  * @param gtid       transaction position `<server_uuid>:<txid>`
  *                   (reference `mysql.py:380-384`)
  * @param content    raw row payload as JSON; for Update events the JSON
  *                   carries `{"before": ..., "after": ...}`
  */
final case class ChangeEvent(
    event_type: String,
    gtid: String,
    database: String,
    table: String,
    content: String)

object ChangeEvent {
  /** Envelope StructType — identical to Encoders.product[ChangeEvent]
    * but usable where a bare schema is needed (readStream, from_json). */
  val schema: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = false),
    StructField("gtid", StringType, nullable = true),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("content", StringType, nullable = true)))
}
