package graft.streaming

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** IncrementalCms: maintained grid == one-shot grid exactly (cells
  * are sums); watermark no-ops a replayed id; a BYPASSED replay
  * drifts — counts are not idempotent, the honest contrast with the
  * HLL/KMV members of the family. */
class IncrementalCmsSpec extends SparkSpec {

  private val table = "cmsspec_grid"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def items = {
    import spark.implicits._
    (0L until 500L).map(i => (i, s"w${i % 37}"))
      .toDF("item_id", "word")
  }

  private def gridOf(df: org.apache.spark.sql.DataFrame) =
    SketchOps.cmsGrid(df, "word").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batched fold == one-shot grid, cell-exact") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = items.filter(pmod($"item_id", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalCms.applyBatch(spark, table,
      part(i), "word", i.toLong))
    val got = IncrementalCms.readGrid(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == gridOf(items))
    assert(got.nonEmpty)
    // estimates from the maintained grid dominate the exact counts
    val est = SketchOps.cmsEstimate(
        IncrementalCms.readGrid(spark, table),
        items.select("word").distinct(), "word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) => assert(est(w) >= c, w) }
  }

  test("replay: watermark no-op; bypassed replay DRIFTS (not idempotent)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = items.filter(pmod($"item_id", lit(3)) === i)
    IncrementalCms.applyBatch(spark, table, part(0), "word", 0L)
    val before = IncrementalCms.readGrid(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // same id: skipped wholesale, cells unchanged
    IncrementalCms.applyBatch(spark, table, part(0), "word", 0L)
    assert(IncrementalCms.readGrid(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == before)
    // fresh id, same rows: cells DOUBLE — the watermark is the only
    // replay defense for additive sketches
    IncrementalCms.applyBatch(spark, table, part(0), "word", 1L)
    val after = IncrementalCms.readGrid(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before.map { case (j, b, c) => (j, b, 2 * c) })
  }
}
