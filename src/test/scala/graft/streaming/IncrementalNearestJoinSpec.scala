package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Incrementally-maintained nearest-join view: one-shot equivalence,
  * match FLIP from a new right event (the reason invalidation is
  * per join key), replay idempotence, tombstone re-match, left-join
  * NULL semantics. */
class IncrementalNearestJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // view rows as (key, left event id, matched right id or -1, gap_us)
  private def view(vt: String) =
    IncrementalNearestJoin.readView(spark, vt)
      .selectExpr("k", "event_id", "coalesce(r_id, -1L)",
        "coalesce(gap_us, -1L)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  private def lb(rows: (Long, String, Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("k", "e_op", "event_id", "ts")
  }
  private def rb(rows: (Long, String, Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("k", "r_op", "r_id", "r_ts")
  }
  private def applyTo(lt: String, rt: String, vt: String)(
      l: Option[org.apache.spark.sql.DataFrame],
      r: Option[org.apache.spark.sql.DataFrame]): Unit =
    IncrementalNearestJoin.applyBatch(spark, lt, rt, vt, l, r, "k",
      "event_id", "r_id", Seq("ts", "event_id"), Seq("r_ts", "r_id"),
      "ts", "r_ts", Seq("r_id"), nBuckets = 4,
      leftOpCol = "e_op", rightOpCol = "r_op")

  test("nearest match maintained across batches; new right event " +
      "flips an untouched left row's match; replay is inert") {
    val (lt, rt, vt) = ("injs_l", "injs_r", "injs_v")
    Seq(lt, rt, vt).foreach(CdcMerge.dropStateTable(spark, _))
    val apply = applyTo(lt, rt, vt) _

    // batch 0: event at 12:00, right events at 10:00 and 15:00 —
    // backward (10:00, gap 2h) beats forward (15:00, gap 3h)
    apply(Some(lb((1L, "u", 10L, ts("2024-01-01 12:00:00")))),
      Some(rb((1L, "u", 100L, ts("2024-01-01 10:00:00")),
        (1L, "u", 101L, ts("2024-01-01 15:00:00")))))
    assert(view(vt) == Set((1L, 10L, 100L, 2L * 3600 * 1000000)))

    // batch 1: a NEW right event at 12:30 arrives — left row 10 was
    // in no batch, but its match must flip to 102 (gap 30 min)
    apply(None, Some(rb((1L, "u", 102L, ts("2024-01-01 12:30:00")))))
    assert(view(vt) == Set((1L, 10L, 102L, -30L * 60 * 1000000)))

    // redelivered batch 1: identical view
    apply(None, Some(rb((1L, "u", 102L, ts("2024-01-01 12:30:00")))))
    assert(view(vt) == Set((1L, 10L, 102L, -30L * 60 * 1000000)))

    // EQUAL distance tie prefers the backward match: event at 13:00
    // sits exactly 30 min after 12:30 and 30 min before 13:30
    apply(Some(lb((1L, "u", 11L, ts("2024-01-01 13:00:00")))),
      Some(rb((1L, "u", 103L, ts("2024-01-01 13:30:00")))))
    assert(view(vt).contains((1L, 11L, 102L, 30L * 60 * 1000000)))
  }

  test("equivalence with one-shot nearestJoin after interleaved " +
      "batches on many keys") {
    val (lt, rt, vt) = ("injs2_l", "injs2_r", "injs2_v")
    Seq(lt, rt, vt).foreach(CdcMerge.dropStateTable(spark, _))
    val apply = applyTo(lt, rt, vt) _
    val lrows = (0L until 60L).map(i => (i % 7, "u", i,
      ts(f"2024-01-${(i % 27) + 1}%02d 0${i % 9}:00:00")))
    val rrows = (0L until 40L).map(i => (i % 7, "u", 1000L + i,
      ts(f"2024-01-${(i % 25) + 2}%02d 0${i % 7}:30:00")))
    // 3 batches per side, unequal splits, plus a redelivery of 1
    Seq(0, 1, 2, 1).foreach { b =>
      apply(Some(lb(lrows.filter(_._3 % 3 == b): _*)),
        Some(rb(rrows.filter(_._3 % 3 == b): _*)))
    }
    val oneShot = graft.operators.TemporalOps.nearestJoin(
        lb(lrows: _*), rb(rrows: _*).where("r_op <> 'Delete'"),
        "k", "k", "ts", "r_ts", Seq("r_id"))
      .selectExpr("k", "event_id", "coalesce(r_id, -1L)",
        "coalesce(gap_us, -1L)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(view(vt) == oneShot)
  }

  test("tombstones: deleted left event leaves; deleted right event " +
      "re-matches its victims; no right rows -> NULL left-join row") {
    val (lt, rt, vt) = ("injs3_l", "injs3_r", "injs3_v")
    Seq(lt, rt, vt).foreach(CdcMerge.dropStateTable(spark, _))
    val apply = applyTo(lt, rt, vt) _

    apply(Some(lb((1L, "u", 10L, ts("2024-01-01 12:00:00")),
      (2L, "u", 20L, ts("2024-01-01 12:00:00")))),
      Some(rb((1L, "u", 100L, ts("2024-01-01 11:00:00")),
        (1L, "u", 101L, ts("2024-01-01 08:00:00")))))
    // key 2 has NO right events: left-join NULL row survives
    assert(view(vt) == Set((1L, 10L, 100L, 3600L * 1000000),
      (2L, 20L, -1L, -1L)))

    // delete the winning right event: its victim re-matches to the
    // next nearest (101, 4h backward)
    apply(None, Some(rb((1L, "Delete", 100L, ts("2024-01-02 00:00:00")))))
    assert(view(vt) == Set((1L, 10L, 101L, 4L * 3600 * 1000000),
      (2L, 20L, -1L, -1L)))

    // delete the left event itself: its view row vanishes
    apply(Some(lb((1L, "Delete", 10L, ts("2024-01-02 00:00:00")))), None)
    assert(view(vt) == Set((2L, 20L, -1L, -1L)))
  }
}
