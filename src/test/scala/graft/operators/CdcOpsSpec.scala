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

  test("sequenceGaps reports internal and boundary gaps") {
    import spark.implicits._
    // ids 0-9 dense; 15-19 (bucket 1: the 10-14 hole is BEFORE its
    // min → boundary gap 5); {25} (bucket 2: gap to 19 = 5); {30,32,
    // 39} (bucket 3: gap to 25 = 4, and 7 ids missing INSIDE 30..39)
    val ids = ((0L to 9L) ++ (15L to 19L) ++ Seq(25L, 30L, 32L, 39L))
      .toDF("id")
    val got = CdcOps.sequenceGaps(ids, "id", bucketSize = 10L)
      .orderBy("bucket").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    def pair(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("missing_inside"), r.getAs[Long]("gap_before"))
    assert(pair(got(0)) == (0L, 5L))
    assert(pair(got(1)) == (0L, 5L))
    assert(pair(got(2)) == (7L, 4L))
  }

  test("sequenceGaps buckets exactly above 2^53 (integer div, not double)") {
    import spark.implicits._
    // adjacent ids above 2^53: double division collapses them into one
    // bucket; integer `div` keeps them distinct and gap-free
    val base = 9007199254740993L // 2^53 + 1
    val ids = Seq(base, base + 1, base + 3).toDF("id")
    val got = CdcOps.sequenceGaps(ids, "id", bucketSize = 1L)
      .orderBy("bucket").collect()
    // only the bucket after the hole reports: gap_before = 1 (id base+2)
    assert(got.length == 1)
    assert(got(0).getAs[Long]("bucket") == base + 3)
    assert(got(0).getAs[Long]("gap_before") == 1L)
  }

  test("sequenceGaps carries the boundary gap across superbuckets") {
    import spark.implicits._
    // bucketSize 2, superSize 2 → superbucket = 4 ids. ids 0,1 fill
    // bucket 0 (sb 0); id 9 lands in bucket 4 (sb 2). The gap spans
    // two superbucket boundaries, so only the broadcast carry (not the
    // within-superbucket lag) can see prev mx = 1 → gap_before = 7.
    val ids = Seq(0L, 1L, 9L).toDF("id")
    val got = CdcOps.sequenceGaps(ids, "id",
      bucketSize = 2L, superSize = 2L).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("bucket") == 4L)
    assert(got(0).getAs[Long]("gap_before") == 7L)
  }

  test("decimal(38,0) accumulation survives sums past 2^63") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // two rows of y² = 9e18 (< 2^63 each): the long sum overflows —
    // an ERROR under ANSI (Spark 4 default), a silent wrap without it;
    // the decimal(38,0) accumulation (q37's formulation) stays exact
    // either way
    val y = 3000000000L
    val df = Seq(y, y).toDF("y")
    val e = intercept[Throwable] { df.agg(sum($"y" * $"y")).collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(";")
    assert(msgs.contains("ARITHMETIC_OVERFLOW"), msgs)
    val exact = df.agg(sum(($"y" * $"y").cast(DecimalType(38, 0))))
      .collect()(0).getDecimal(0)
    assert(exact == new java.math.BigDecimal("18000000000000000000"))
  }
}
