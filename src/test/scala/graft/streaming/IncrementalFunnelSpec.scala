package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** IncrementalFunnel: time-ordered folds equal the one-shot funnel
  * (cross-batch and within-batch chains); replay no-ops; an
  * out-of-contract (out-of-order) batch can only UNDER-count, never
  * invent a conversion. */
class IncrementalFunnelSpec extends SparkSpec {

  private val table = "funnelspec_state"
  private val steps = Seq("view", "click", "purchase")

  private def freshTable(): Unit =
    IncrementalFunnel.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def ts(m: Int) = Timestamp.valueOf(f"2024-06-01 00:$m%02d:00")

  // u1 completes across three batches; u2 completes inside batch 0;
  // u3 purchase-before-click (depth 2, the click lands in batch 1);
  // u4 clicks without ever viewing (depth 0)
  private def batch0 = {
    import spark.implicits._
    Seq((1L, "view", ts(1)),
      (2L, "view", ts(2)), (2L, "click", ts(3)),
      (2L, "purchase", ts(4)),
      (3L, "view", ts(2)), (3L, "purchase", ts(3)),
      (4L, "click", ts(1))
    ).toDF("user_id", "event_type", "ts")
  }
  private def batch1 = {
    import spark.implicits._
    Seq((1L, "click", ts(11)), (3L, "click", ts(12)),
      (4L, "purchase", ts(11))
    ).toDF("user_id", "event_type", "ts")
  }
  private def batch2 = {
    import spark.implicits._
    Seq((1L, "purchase", ts(21))).toDF("user_id", "event_type", "ts")
  }

  private def allEvents = batch0
    .unionByName(batch1).unionByName(batch2)

  private def report() = IncrementalFunnel
    .funnelReport(spark, table, steps)
    .orderBy(col("step")).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq

  test("time-ordered folds == one-shot funnel, chains across batches") {
    freshTable()
    IncrementalFunnel.applyBatch(spark, table, batch0, steps, 0L)
    IncrementalFunnel.applyBatch(spark, table, batch1, steps, 1L)
    IncrementalFunnel.applyBatch(spark, table, batch2, steps, 2L)
    val oneShot = TemporalOps.funnelSteps(allEvents, steps)
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(report() == oneShot)
    // views u1,u2,u3 = 3; clicks-after-view u1,u2,u3 = 3;
    // purchases-after-click u1,u2 = 2
    assert(report() == Seq((0L, "view", 3L, 1000000L),
      (1L, "click", 3L, 1000000L), (2L, "purchase", 2L, 666666L)))
    freshTable()
  }

  test("k-step generality: a 4-step fold == the one-shot 4-step funnel") {
    import spark.implicits._
    val t4 = "funnelspec_state4"
    val steps4 = Seq("view", "click", "cart", "purchase")
    IncrementalFunnel.tables(t4)
      .foreach(CdcMerge.dropStateTable(spark, _))
    // u1 completes all 4 across batches; u2 completes all 4 inside
    // one batch (the within-fold induction chain); u3 stalls at cart;
    // u4 carts before clicking (step skipped — must not count)
    val b0 = Seq((1L, "view", ts(1)),
      (2L, "view", ts(1)), (2L, "click", ts(2)), (2L, "cart", ts(3)),
      (2L, "purchase", ts(4)),
      (3L, "view", ts(2)), (3L, "click", ts(3)),
      (4L, "view", ts(1)), (4L, "cart", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val b1 = Seq((1L, "click", ts(11)), (3L, "cart", ts(12)),
      (4L, "purchase", ts(11))
    ).toDF("user_id", "event_type", "ts")
    val b2 = Seq((1L, "cart", ts(21)), (1L, "purchase", ts(22))
    ).toDF("user_id", "event_type", "ts")
    IncrementalFunnel.applyBatch(spark, t4, b0, steps4, 0L)
    IncrementalFunnel.applyBatch(spark, t4, b1, steps4, 1L)
    IncrementalFunnel.applyBatch(spark, t4, b2, steps4, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("step")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
    val inc = rows(IncrementalFunnel.funnelReport(spark, t4, steps4))
    val oneShot = rows(TemporalOps.funnelSteps(
      b0.unionByName(b1).unionByName(b2), steps4))
    assert(inc == oneShot)
    // views u1-u4 = 4; clicks u1,u2,u3 = 3; carts u1,u2,u3 = 3;
    // purchases u1,u2 = 2 (u4's cart-before-click never counts)
    assert(inc.map(_._3) == Seq(4L, 3L, 3L, 2L))
    IncrementalFunnel.tables(t4)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("nBuckets drift fails fast against table metadata") {
    freshTable()
    IncrementalFunnel.applyBatch(spark, table, batch0, steps, 0L,
      nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      IncrementalFunnel.applyBatch(spark, table, batch1, steps, 1L,
        nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets"))
    freshTable()
  }

  test("replayed batch id is a no-op") {
    freshTable()
    IncrementalFunnel.applyBatch(spark, table, batch0, steps, 0L)
    IncrementalFunnel.applyBatch(spark, table, batch1, steps, 1L)
    val before = report()
    IncrementalFunnel.applyBatch(spark, table, batch1, steps, 1L)
    assert(report() == before)
    freshTable()
  }

  test("a trickle batch rewrites ONLY its users' buckets " +
      "(corpus-keyed state lives in CdcMerge, not TableSwap)") {
    import spark.implicits._
    freshTable()
    // seed many users so the state spans several buckets
    val seed = (0L until 64L).map(u => (u, "view", ts(1)))
      .toDF("user_id", "event_type", "ts")
    IncrementalFunnel.applyBatch(spark, table, seed, steps, 0L,
      nBuckets = 16)
    val filesBefore = spark.table(table).inputFiles.toSet
    // one user converts — exactly one bucket should rewrite
    val trickle = Seq((5L, "click", ts(11)))
      .toDF("user_id", "event_type", "ts")
    IncrementalFunnel.applyBatch(spark, table, trickle, steps, 1L,
      nBuckets = 16)
    val filesAfter = spark.table(table).inputFiles.toSet
    val untouched = filesBefore.intersect(filesAfter)
    assert(untouched.size >= filesBefore.size - 1,
      s"expected <=1 bucket rewritten, kept ${untouched.size} of " +
        s"${filesBefore.size}")
    assert(report()(1)._3 == 1L) // the click landed
    freshTable()
  }

  test("out-of-order batch under-counts, never invents a conversion") {
    import spark.implicits._
    freshTable()
    // CONTRACT VIOLATION: the click arrives in batch 0, the earlier
    // view only in batch 1. One-shot sees the full chain; the fold
    // cannot (the click was discarded while no view existed) — the
    // maintained count must be <= one-shot at every step.
    val b0 = Seq((7L, "click", ts(5))).toDF("user_id", "event_type", "ts")
    val b1 = Seq((7L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    IncrementalFunnel.applyBatch(spark, table, b0, steps, 0L)
    IncrementalFunnel.applyBatch(spark, table, b1, steps, 1L)
    val inc = report()
    val oneShot = TemporalOps
      .funnelSteps(b0.unionByName(b1), steps)
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(oneShot(1)._3 == 1L) // one-shot sees view -> click
    assert(inc(0)._3 == 1L && inc(1)._3 == 0L) // fold lost the click
    (0 to 2).foreach(i => assert(inc(i)._3 <= oneShot(i)._3))
    freshTable()
  }
}
