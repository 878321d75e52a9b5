package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class CdcOpsSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf("sf0.001"), "events")

  test("classifyOp maps the full taxonomy and skips unknowns") {
    import spark.implicits._
    val got = Seq("signup", "purchase", "click", "error", "view", "???")
      .toDF("event_type")
      .select(CdcOps.classifyOp($"event_type").as("op"))
      .as[String].collect().toSeq
    assert(got == Seq("Insert", "Insert", "Update", "Delete", "Skip", "Skip"))
  }

  test("toEnvelope carries gtid/database/table and raw content") {
    val env = CdcOps.toEnvelope(events, serverUuid = "u-1",
      database = "db", table = "t")
    val row = env.orderBy(col("event_id")).limit(1).collect()(0)
    assert(row.getAs[String]("gtid") == "u-1:0")
    assert(row.getAs[String]("database") == "db")
    assert(row.getAs[String]("table") == "t")
    assert(row.getAs[String]("content").startsWith("{"))
  }

  test("filter chain composes in order; empty chain is identity") {
    val add = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("x", lit(1))
    val mul = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("x", col("x") * 10)
    val chained = CdcOps.FilterChain.of(add, mul)(events)
    assert(chained.select(max(col("x"))).collect()(0).getInt(0) == 10)
    // reversed order would fail resolution (x missing) — order matters
    intercept[Exception] {
      CdcOps.FilterChain.of(mul, add)(events).collect()
    }
    assert(CdcOps.FilterChain.identity(events).columns sameElements
      events.columns)
  }

  test("dropEmpty removes null/empty content") {
    import spark.implicits._
    val df = Seq(("a", "{}"), ("b", ""), ("c", null))
      .toDF("event_type", "content")
    assert(CdcOps.dropEmpty(df).count() == 1)
  }

  test("serialize normalizes typed columns to a JSON payload") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
      .select(CdcOps.serialize(col("id"), col("name")).as("j"))
    assert(df.as[String].collect()(0) == """{"id":1,"name":"x"}""")
  }
}
