package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Incrementally-maintained join view: one-shot equivalence, replay
  * idempotence, unmatch removal, drained-partition drop. */
class IncrementalJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def view(vt: String) =
    IncrementalJoin.readView(spark, vt)
      .select("k", "l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batched maintenance equals one-shot join; replay is inert") {
    import spark.implicits._
    val (lt, rt, vt) = ("ijs_l", "ijs_r", "ijs_v")
    Seq(lt, rt, vt).foreach(CdcMerge.dropStateTable(spark, _))
    def lb(rows: (Long, String, Long, Timestamp)*) =
      rows.toDF("k", "l_op", "l_id", "l_ts")
    def rb(rows: (Long, String, Long, Timestamp)*) =
      rows.toDF("k", "r_op", "r_id", "r_ts")
    def apply(l: Option[org.apache.spark.sql.DataFrame],
        r: Option[org.apache.spark.sql.DataFrame]): Unit =
      IncrementalJoin.applyBatch(spark, lt, rt, vt, l, r, "k",
        Seq("l_ts", "l_id"), Seq("r_ts", "r_id"), nBuckets = 4,
        leftOpCol = "l_op", rightOpCol = "r_op")

    // batch 0: keys 1,2 on the left; 1 on the right -> view {1}
    apply(Some(lb((1L, "u", 10L, ts("2024-01-01 00:00:00")),
      (2L, "u", 20L, ts("2024-01-01 00:00:00")))),
      Some(rb((1L, "u", 100L, ts("2024-01-01 00:00:00")))))
    assert(view(vt) == Set((1L, 10L, 100L)))

    // batch 1: right gains key 2; left updates key 1 to a newer row
    apply(Some(lb((1L, "u", 11L, ts("2024-01-02 00:00:00")))),
      Some(rb((2L, "u", 200L, ts("2024-01-02 00:00:00")))))
    assert(view(vt) == Set((1L, 11L, 100L), (2L, 20L, 200L)))

    // redelivered batch 1: identical view, identical states
    apply(Some(lb((1L, "u", 11L, ts("2024-01-02 00:00:00")))),
      Some(rb((2L, "u", 200L, ts("2024-01-02 00:00:00")))))
    assert(view(vt) == Set((1L, 11L, 100L), (2L, 20L, 200L)))

    // STALE update loses to the newer state (out-of-order delivery)
    apply(Some(lb((1L, "u", 9L, ts("2023-12-01 00:00:00")))), None)
    assert(view(vt) == Set((1L, 11L, 100L), (2L, 20L, 200L)))
  }

  test("tombstone on one side removes the view row; partitions drain") {
    import spark.implicits._
    val (lt, rt, vt) = ("ijs2_l", "ijs2_r", "ijs2_v")
    Seq(lt, rt, vt).foreach(CdcMerge.dropStateTable(spark, _))
    def lb(rows: (Long, String, Long, Timestamp)*) =
      rows.toDF("k", "l_op", "l_id", "l_ts")
    def rb(rows: (Long, String, Long, Timestamp)*) =
      rows.toDF("k", "r_op", "r_id", "r_ts")
    def apply(l: Option[org.apache.spark.sql.DataFrame],
        r: Option[org.apache.spark.sql.DataFrame]): Unit =
      IncrementalJoin.applyBatch(spark, lt, rt, vt, l, r, "k",
        Seq("l_ts", "l_id"), Seq("r_ts", "r_id"), nBuckets = 2,
        leftOpCol = "l_op", rightOpCol = "r_op")

    apply(Some(lb((1L, "u", 10L, ts("2024-01-01 00:00:00")),
      (2L, "u", 20L, ts("2024-01-01 00:00:00")))),
      Some(rb((1L, "u", 100L, ts("2024-01-01 00:00:00")),
        (2L, "u", 200L, ts("2024-01-01 00:00:00")))))
    assert(view(vt) == Set((1L, 10L, 100L), (2L, 20L, 200L)))

    // delete key 1 on the right: its view row must vanish even though
    // the left side still has it
    apply(None, Some(rb((1L, "Delete", 101L, ts("2024-01-03 00:00:00")))))
    assert(view(vt) == Set((2L, 20L, 200L)))

    // delete key 2 too: with nBuckets=2 some partition fully drains —
    // the drop-partition path must leave a readable, empty-consistent
    // view
    apply(Some(lb((2L, "Delete", 21L, ts("2024-01-03 00:00:00")))), None)
    assert(view(vt).isEmpty)

    // re-insert after erasure: the view resurrects the key
    apply(Some(lb((2L, "u", 22L, ts("2024-01-04 00:00:00")))), None)
    assert(view(vt) == Set((2L, 22L, 200L)))
  }
}
