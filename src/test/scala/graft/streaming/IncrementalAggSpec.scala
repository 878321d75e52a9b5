package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Incremental aggregate maintenance: transition deltas (group moves,
  * deletes, drained groups), watermark idempotence under replay. */
class IncrementalAggSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def env(rows: (Long, String, String, Long, String, Double)*)
      : DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (k, t, op, id, g, v) => (k, ts(t), op, id, g, v) }
      .toDF("k", "ts", "event_type", "event_id", "grp", "value")
  }

  private def apply1(state: String, agg: String, b: DataFrame,
      batchId: Long): Unit =
    IncrementalAgg.applyBatch(spark, state, agg, b, "k",
      Seq("ts", "event_id"), 4, "grp", "value", batchId)

  private def aggMap(agg: String): Map[String, (Long, BigDecimal)] =
    IncrementalAgg.readAgg(spark, agg).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_live"),
          BigDecimal(r.getAs[java.math.BigDecimal]("sum_value"))))
      .toMap

  private def fresh(name: String): (String, String) = {
    val (st, ag) = (s"${name}_state", s"${name}_agg")
    Seq(st, s"${st}_stage", ag, s"${ag}_stage")
      .foreach(CdcMerge.dropStateTable(spark, _))
    (st, ag)
  }

  test("inserts, group-moving update, delete: deltas track the view") {
    val (st, ag) = fresh("ia_basic")
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L, "a", 10.0),
      (2L, "2026-01-01 00:00:02", "Insert", 2L, "a", 5.0),
      (3L, "2026-01-01 00:00:03", "Insert", 3L, "b", 7.5)), 0L)
    assert(aggMap(ag) == Map(
      "a" -> (2L, BigDecimal("15.00")), "b" -> (1L, BigDecimal("7.50"))))
    // key 1 MOVES from group a to b with a new value; key 3 is deleted
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:04", "Update", 4L, "b", 20.0),
      (3L, "2026-01-01 00:00:05", "Delete", 5L, "b", 0.0)), 1L)
    assert(aggMap(ag) == Map(
      "a" -> (1L, BigDecimal("5.00")), "b" -> (1L, BigDecimal("20.00"))))
  }

  test("a fully-drained group drops out of the view") {
    val (st, ag) = fresh("ia_drain")
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L, "only", 3.0)), 0L)
    assert(aggMap(ag) == Map("only" -> (1L, BigDecimal("3.00"))))
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:02", "Delete", 2L, "only", 0.0)), 1L)
    assert(aggMap(ag).isEmpty)
  }

  test("watermark survives a fully-drained view (crash-window replay)") {
    import org.apache.spark.sql.functions._
    val (st, ag) = fresh("ia_wm")
    val b0 = env((1L, "2026-01-01 00:00:01", "Insert", 1L, "only", 3.0))
    apply1(st, ag, b0, 0L)
    // batch 1 drains the only group -> the VIEW is empty, but the
    // watermark row (n_live 0) must remain in the physical table
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:02", "Delete", 2L, "only", 0.0)), 1L)
    assert(aggMap(ag).isEmpty)
    assert(spark.table(ag).agg(max("_batch")).collect()(0).getLong(0) == 1L,
      "drained view lost the idempotence watermark")
    // crash between agg write and state commit, replay of batch 1 with
    // a (hypothetically) non-zero delta: must be SKIPPED by the
    // watermark, not re-applied — the exact case an empty-table
    // max(_batch) watermark gets wrong
    IncrementalAgg.applyDeltas(spark, ag,
      oldRows = b0.limit(0), newRows = b0,
      groupCol = "grp", valueCol = "value", batchId = 1L,
      opCol = "event_type", deleteOp = "Delete")
    assert(aggMap(ag).isEmpty,
      "replayed batch re-applied its delta after the view drained")
  }

  test("half-swapped agg table recovers on read and on apply") {
    val (st, ag) = fresh("ia_swap")
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L, "a", 10.0)), 0L)
    val before = aggMap(ag)
    // crash between TableSwap's two renames: the name is gone, the
    // data lives only under _old
    spark.sql(s"ALTER TABLE $ag RENAME TO ${ag}_old")
    assert(aggMap(ag) == before, "readAgg did not recover the swap")
    spark.sql(s"ALTER TABLE $ag RENAME TO ${ag}_old")
    // an applied batchId must still be skipped after recovery (the
    // watermark lives in the recovered table)
    IncrementalAgg.applyDeltas(spark, ag,
      oldRows = env().limit(0),
      newRows = env((1L, "2026-01-01 00:00:02", "Insert", 2L, "a", 5.0)),
      groupCol = "grp", valueCol = "value", batchId = 0L,
      opCol = "event_type", deleteOp = "Delete")
    assert(aggMap(ag) == before)
  }

  test("replayed batch is a no-op twice over: zero delta AND watermark") {
    val (st, ag) = fresh("ia_replay")
    val b0 = env((1L, "2026-01-01 00:00:01", "Insert", 1L, "a", 10.0))
    val b1 = env((1L, "2026-01-01 00:00:02", "Update", 2L, "a", 12.0))
    apply1(st, ag, b0, 0L); apply1(st, ag, b1, 1L)
    val before = aggMap(ag)
    // full redelivery (merge no-op -> zero transition delta; watermark
    // additionally skips the whole agg write)
    apply1(st, ag, b1, 1L)
    assert(aggMap(ag) == before)
    // and a direct applyDeltas with an already-applied id is skipped
    // even with a NON-zero delta (the crash-between-agg-and-state case)
    IncrementalAgg.applyDeltas(spark, ag,
      oldRows = b0.limit(0), newRows = b0,
      groupCol = "grp", valueCol = "value", batchId = 1L,
      opCol = "event_type", deleteOp = "Delete")
    assert(aggMap(ag) == before)
  }

  test("incremental result equals recompute over the live state") {
    import org.apache.spark.sql.functions._
    val (st, ag) = fresh("ia_equal")
    apply1(st, ag, env(
      (1L, "2026-01-01 00:00:01", "Insert", 1L, "x", 1.25),
      (2L, "2026-01-01 00:00:02", "Insert", 2L, "y", 2.5),
      (3L, "2026-01-01 00:00:03", "Insert", 3L, "x", 4.0)), 0L)
    apply1(st, ag, env(
      (2L, "2026-01-01 00:00:04", "Update", 4L, "x", 3.0),
      (4L, "2026-01-01 00:00:05", "Insert", 5L, "y", 9.0)), 1L)
    val recomputed = CdcMerge.readState(spark, st)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_live"),
        sum(col("value").cast("decimal(20,2)")).as("sum_value"))
      .collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_live"),
          BigDecimal(r.getAs[java.math.BigDecimal]("sum_value"))))
      .toMap
    assert(aggMap(ag) == recomputed)
  }
}
