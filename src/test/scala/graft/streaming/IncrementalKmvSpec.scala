package graft.streaming

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** IncrementalKmv: the maintained k-smallest table IS the one-shot
  * sketch (exact set equality, not estimate equality); replay is a
  * no-op via the watermark AND via set semantics when bypassed. */
class IncrementalKmvSpec extends SparkSpec {

  private val table = "kmvspec_sketches"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def events = {
    import spark.implicits._
    (0L until 900L).map { i =>
      (i, i % 313, if (i % 3 == 0) "a" else "b")
    }.toDF("event_id", "user_id", "seg")
  }

  private def oneShot(k: Int) = {
    import spark.implicits._
    Seq("a", "b").map { g =>
      SketchOps.kmvSketch(events.filter($"seg" === g), "user_id", k)
        .withColumn("seg", lit(g))
    }.reduce(_ unionByName _)
  }

  test("batched fold == one-shot sketch, exact set equality") {
    import spark.implicits._
    freshTable()
    val k = 16
    def part(i: Int) = events.filter(pmod($"event_id", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalKmv.applyBatch(spark, table,
      part(i), "seg", "user_id", i.toLong, k))
    val got = IncrementalKmv.readSketches(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = oneShot(k).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (h, g) => (g, h) }.toSet
    assert(got == want)
    assert(got.size == 32) // both segments full at k=16
  }

  test("replay: watermark no-op AND set-semantics no-op") {
    import spark.implicits._
    freshTable()
    val k = 16
    def part(i: Int) = events.filter(pmod($"event_id", lit(3)) === i)
    IncrementalKmv.applyBatch(spark, table, part(0), "seg",
      "user_id", 0L, k)
    IncrementalKmv.applyBatch(spark, table, part(1), "seg",
      "user_id", 1L, k)
    val before = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // same id: skipped wholesale
    IncrementalKmv.applyBatch(spark, table, part(1), "seg",
      "user_id", 1L, k)
    assert(spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == before)
    // fresh id, same rows: hashes unchanged by set union
    IncrementalKmv.applyBatch(spark, table, part(1), "seg",
      "user_id", 2L, k)
    val after = IncrementalKmv.readSketches(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before.map(t => (t._1, t._2)))
  }
}
