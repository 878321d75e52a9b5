package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** IncrementalHourly: out-of-order batched fold == one-shot hourly
  * counts (sums associate); watermark no-ops a replayed id; a
  * BYPASSED replay drifts (additive camp). */
class IncrementalHourlySpec extends SparkSpec {

  private val table = "hourlyspec_counts"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def ev = {
    import spark.implicits._
    (0 until 600).map { i =>
      val h = i % 50
      (if (i % 3 == 0) "view" else "click",
        Timestamp.valueOf(f"2024-02-${1 + h / 24}%02d " +
          f"${h % 24}%02d:${i % 60}%02d:00"))
    }.toDF("event_type", "ts")
  }

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("out-of-order batched fold == one-shot counts; report equal") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
    Seq(2, 0, 1).zipWithIndex.foreach { case (p, bid) =>
      IncrementalHourly.applyBatch(spark, table, part(p), bid.toLong)
    }
    val got = cells(TableSwap.readVersioned(spark, table)
      .select("event_type", "hr", "cnt"))
    assert(got == cells(TemporalOps.hourlyCounts(ev)) && got.nonEmpty)
    val rep = IncrementalHourly.anomalyReport(spark, table)
      .collect().map(_.toSeq).toSet
    val one = TemporalOps.anomalyWindows(ev)
      .collect().map(_.toSeq).toSet
    assert(rep == one)
  }

  test("replay: watermark no-op; bypassed replay DRIFTS (additive)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
    IncrementalHourly.applyBatch(spark, table, part(0), 0L)
    val before = cells(TableSwap.readVersioned(spark, table)
      .select("event_type", "hr", "cnt"))
    IncrementalHourly.applyBatch(spark, table, part(0), 0L)
    assert(cells(TableSwap.readVersioned(spark, table)
      .select("event_type", "hr", "cnt")) == before)
    IncrementalHourly.applyBatch(spark, table, part(0), 1L)
    val after = cells(TableSwap.readVersioned(spark, table)
      .select("event_type", "hr", "cnt"))
    assert(after == before.map { case (t, h, c) => (t, h, 2 * c) })
  }
}
