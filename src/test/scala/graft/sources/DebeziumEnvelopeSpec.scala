package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.CdcOps

/** Debezium-envelope transform on synthetic wire-shaped JSON: schema
  * parse, op taxonomy, null before/after images, graft-envelope
  * projection, and composition with the downstream CDC operators. */
class DebeziumEnvelopeSpec extends SparkSpec {

  private val payload = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def src(gtid: String) =
    s""""source":{"version":"2.5.0.Final","connector":"mysql",
        "name":"dbserver1","ts_ms":1700000000000,"snapshot":"false",
        "db":"inventory","table":"customers","server_id":184054,
        "gtid":"$gtid","file":"mysql-bin.000003","pos":484,"row":0}"""
      .replaceAll("\n\\s*", "")

  private lazy val rows = Seq(
    // snapshot read
    s"""{"before":null,"after":{"id":1,"name":"anne"},${src("uuid:1")},"op":"r","ts_ms":1700000000001}""",
    // insert
    s"""{"before":null,"after":{"id":2,"name":"bob"},${src("uuid:2")},"op":"c","ts_ms":1700000000002}""",
    // update (both images)
    s"""{"before":{"id":2,"name":"bob"},"after":{"id":2,"name":"bo"},${src("uuid:3")},"op":"u","ts_ms":1700000000003}""",
    // delete (no after image)
    s"""{"before":{"id":1,"name":"anne"},"after":null,${src("uuid:4")},"op":"d","ts_ms":1700000000004}""",
    // truncate-ish / unknown op -> Skip
    s"""{"before":null,"after":null,${src("uuid:5")},"op":"t","ts_ms":1700000000005}""")

  private lazy val raw = {
    import spark.implicits._
    rows.toDF("value")
  }

  test("parse: declared schema yields typed nullable before/after") {
    val parsed = DebeziumEnvelope.parse(raw, payload)
    val got = parsed.select(
      col("envelope.op").as("op"),
      col("envelope.before.name").as("b"),
      col("envelope.after.name").as("a"),
      col("envelope.source.gtid").as("gtid")).collect()
    assert(got.length == 5)
    val byOp = got.map(r => r.getAs[String]("op") ->
      (Option(r.getAs[String]("b")), Option(r.getAs[String]("a")))).toMap
    assert(byOp("r") == (None, Some("anne")))
    assert(byOp("c") == (None, Some("bob")))
    assert(byOp("u") == (Some("bob"), Some("bo")))
    assert(byOp("d") == (Some("anne"), None))
    assert(got.forall(_.getAs[String]("gtid").startsWith("uuid:")))
  }

  test("unknown extra fields ignored; absent fields null") {
    import spark.implicits._
    val weird = Seq(
      """{"after":{"id":9,"name":"zoe"},"op":"c","unknown_v99_field":42}""")
      .toDF("value")
    val r = DebeziumEnvelope.parse(weird, payload)
      .select(col("envelope.after.id"), col("envelope.source.db"),
        col("envelope.ts_ms")).collect()(0)
    assert(r.getLong(0) == 9L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("op taxonomy: c/r -> Insert, u -> Update, d -> Delete, else Skip") {
    val env = DebeziumEnvelope.toGraftEnvelope(
      DebeziumEnvelope.parse(raw, payload))
    val ops = env.select("event_type").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("Insert", "Insert", "Update", "Delete", "Skip"))
  }

  test("graft envelope: provenance carried, content round-trips typed") {
    val env = DebeziumEnvelope.toGraftEnvelope(
      DebeziumEnvelope.parse(raw, payload))
    val kept = CdcOps.dropSkipped(env)
    assert(kept.count() == 4)
    val meta = kept.select("database", "table").distinct().collect()
    assert(meta.length == 1 &&
      meta(0).getString(0) == "inventory" &&
      meta(0).getString(1) == "customers")
    // the serialized content reads back out through typedUpdateView
    val upd = CdcOps.typedUpdateView(
      kept.filter(col("event_type") === "Update"), payload)
      .select(col("before.name"), col("after.name")).collect()(0)
    assert(upd.getString(0) == "bob" && upd.getString(1) == "bo")
  }
}
