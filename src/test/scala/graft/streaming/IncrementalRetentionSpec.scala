package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** IncrementalRetention: out-of-order batched fold == one-shot
  * matrix; replay is a no-op without a watermark (set state); the
  * state is the activity grid, not the event log — held in a
  * CdcMerge-bucketed table (corpus-keyed state: no whole-grid
  * rewrite, upserts prune to the batch's user buckets). */
class IncrementalRetentionSpec extends SparkSpec {

  private val table = "retspec_grid"

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def ev = {
    import spark.implicits._
    // 40 users, staggered first weeks, several events per user-week
    (0L until 400L).map { i =>
      val u = i % 40
      val day = ((u % 5) * 7 + (i % 20)).toInt // first week varies
      (u, Timestamp.valueOf(f"2024-01-${1 + day % 28}%02d 10:00:00"))
    }.toDF("user_id", "ts")
  }

  private def matrix(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("out-of-order batched fold == one-shot matrix") {
    import spark.implicits._
    freshTable()
    // date-sliced batches folded OUT OF ORDER: late events only add
    // grid cells; per-user min week is order-free
    def part(i: Int) = ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
    Seq(2, 0, 1).foreach(i =>
      IncrementalRetention.applyBatch(spark, table, part(i)))
    val got = matrix(IncrementalRetention.retentionReport(spark, table))
    val one = matrix(TemporalOps.retentionCohorts(ev))
    assert(got == one && got.nonEmpty)
  }

  test("replayed batch is a no-op (set state, no watermark)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
    Seq(0, 1).foreach(i =>
      IncrementalRetention.applyBatch(spark, table, part(i)))
    def grid() = IncrementalRetention.readGrid(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = grid()
    IncrementalRetention.applyBatch(spark, table, part(1))
    assert(grid() == before)
  }

  test("a trickle batch rewrites ONLY its users' buckets") {
    import spark.implicits._
    freshTable()
    IncrementalRetention.applyBatch(spark, table, ev, nBuckets = 16)
    val filesBefore = spark.table(table).inputFiles.toSet
    // one user, one new week — touches exactly user 7's bucket
    val trickle = Seq((7L,
      java.sql.Timestamp.valueOf("2024-06-01 10:00:00")))
      .toDF("user_id", "ts")
    IncrementalRetention.applyBatch(spark, table, trickle,
      nBuckets = 16)
    val filesAfter = spark.table(table).inputFiles.toSet
    // untouched buckets keep their exact files; only the trickle
    // user's bucket was rewritten
    val untouched = filesBefore.intersect(filesAfter)
    assert(untouched.size >= filesBefore.size - 1,
      s"expected <=1 bucket rewritten, kept ${untouched.size} of " +
        s"${filesBefore.size}")
    assert(IncrementalRetention.readGrid(spark, table)
      .filter($"user_id" === 7L).count() >
      TemporalOps.activityGrid(ev).filter($"user_id" === 7L).count())
  }

  test("state is the activity grid, far below the event count") {
    import spark.implicits._
    freshTable()
    IncrementalRetention.applyBatch(spark, table, ev)
    val stateRows = spark.table(table).count()
    assert(stateRows == TemporalOps.activityGrid(ev).count())
    assert(stateRows < ev.count())
  }
}
