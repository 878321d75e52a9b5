package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IncrementalHll: batched sketch maintenance equals the one-shot
  * rollup; replay is a no-op BOTH via the watermark and via register
  * algebra (max(x, x) = x) when the watermark is bypassed. */
class IncrementalHllSpec extends SparkSpec {

  private val table = "hllspec_sketches"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def events = {
    import spark.implicits._
    (0L until 600L).map { i =>
      (i, java.sql.Timestamp.valueOf(
         s"2024-01-0${i % 5 + 1} 0${i % 9}:00:00"),
       i % 97, s"type${i % 3}")
    }.toDF("event_id", "ts", "user_id", "event_type")
  }

  private def oneShotEst = events
    .groupBy(col("event_type"), to_date(col("ts")).as("day"))
    .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    .groupBy("event_type")
    .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))

  test("three disjoint batches == one-shot sketch rollup") {
    import spark.implicits._
    freshTable()
    val ev = events
    def part(i: Int) = ev.filter(pmod($"event_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalHll.applyBatch(spark, table, part(i), i.toLong))
    val inc = IncrementalHll.estimateByType(spark, table)
      .orderBy($"event_type").collect().toSeq
    val one = oneShotEst.orderBy($"event_type").collect().toSeq
    assert(inc == one)
    assert(inc.nonEmpty)
  }

  test("replay is a watermark no-op AND a register no-op") {
    import spark.implicits._
    freshTable()
    val ev = events
    def part(i: Int) = ev.filter(pmod($"event_id", lit(3)) === i)
    IncrementalHll.applyBatch(spark, table, part(0), 0L)
    IncrementalHll.applyBatch(spark, table, part(1), 1L)
    // watermark layer: same id changes nothing, including _batch
    // (sk is Array[Byte] — wrap in Seq for value equality)
    def snapshot() = spark.table(table).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getAs[Array[Byte]]("sk").toSeq, r.getAs[Long]("_batch")))
      .toSet
    val before = snapshot()
    IncrementalHll.applyBatch(spark, table, part(1), 1L)
    assert(snapshot() == before)
    // algebra layer: BYPASS the watermark (fresh id, same rows) —
    // the union must leave every register, hence every estimate,
    // unchanged
    val estBefore = IncrementalHll.estimateByType(spark, table)
      .orderBy($"event_type").collect().toSeq
    IncrementalHll.applyBatch(spark, table, part(1), 2L)
    val estAfter = IncrementalHll.estimateByType(spark, table)
      .orderBy($"event_type").collect().toSeq
    assert(estAfter == estBefore)
  }
}
