package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest right row <= left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (10L, ts("2024-01-01 13:00:00"), "c"),
      (20L, ts("2024-01-01 09:00:00"), "d") // equal time -> included (<=)
    ).toDF("rk", "rt", "v")

    val got = TemporalOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      Seq("rt", "v"))
      .orderBy("id").collect()
    assert(got.map(_.getAs[String]("v")).toSeq == Seq("a", "b", "d", null))
    // the matched right timestamp rides along
    assert(got(1).getAs[Timestamp]("rt") == ts("2024-01-01 11:00:00"))
    // unmatched key (30) keeps its left row with null value cols
    assert(got(3).getAs[Timestamp]("rt") == null)
  }

  test("nearestJoin: closest match either direction, ties backward") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // 30m back vs 60m fwd -> a
      (2L, 10L, ts("2024-01-01 10:50:00")), // 10m fwd vs 80m back -> b
      (3L, 10L, ts("2024-01-01 10:15:00")), // 45m back == 45m fwd -> a
      (4L, 20L, ts("2024-01-01 09:00:00")), // only later rows -> d
      (5L, 30L, ts("2024-01-01 09:00:00"))  // no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (20L, ts("2024-01-01 10:00:00"), "d")
    ).toDF("rk", "rt", "v")
    val got = TemporalOps.nearestJoin(left, right, "k", "rk", "t", "rt",
      Seq("rt", "v")).orderBy("id").collect()
    assert(got.map(_.getAs[String]("v")).toSeq ==
      Seq("a", "b", "a", "d", null))
    // signed gap in exact micros: left minus matched right
    assert(got(0).getAs[Long]("gap_us") == 30L * 60 * 1000000)
    assert(got(1).getAs[Long]("gap_us") == -10L * 60 * 1000000)
    assert(got(3).getAs[Long]("gap_us") == -60L * 60 * 1000000)
    assert(got(4).getAs[Any]("gap_us") == null)
  }

  test("asOfJoin: left columns survive untouched") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-06-01 00:00:00"), "payload"))
      .toDF("id", "k", "t", "extra")
    val right = Seq((5L, ts("2024-05-01 00:00:00"), 42.0))
      .toDF("rk", "rt", "x")
    val got = TemporalOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      Seq("x")).collect()(0)
    assert(got.getAs[String]("extra") == "payload")
    assert(got.getAs[Double]("x") == 42.0)
  }

  test("funnelSteps: strict order, first-touch, out-of-order excluded") {
    import spark.implicits._
    def t(m: Int) = ts(f"2024-06-01 00:$m%02d:00")
    // u1: full funnel in order. u2: purchase BEFORE click — depth 2.
    // u3: only view. u4: click/purchase but no view — depth 0.
    // u5: full funnel where only the SECOND click is after view —
    //     first-touch must use the earliest VALID click.
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "view", t(1)), (2L, "purchase", t(2)), (2L, "click", t(3)),
      (3L, "view", t(5)),
      (4L, "click", t(1)), (4L, "purchase", t(2)),
      (5L, "click", t(1)), (5L, "view", t(2)), (5L, "click", t(4)),
      (5L, "purchase", t(5))
    ).toDF("user_id", "event_type", "ts")
    val got = TemporalOps.funnelSteps(ev,
        Seq("view", "click", "purchase"))
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // views: u1,u2,u3,u5 = 4; clicks-after-view: u1,u2,u5 = 3;
    // purchases-after-that-click: u1,u5 = 2
    assert(got.toSeq == Seq(
      (0L, "view", 4L, 1000000L),
      (1L, "click", 3L, 750000L),
      (2L, "purchase", 2L, 666666L)))
  }

  test("funnelSteps: single step and empty funnel tail") {
    import spark.implicits._
    def t(m: Int) = ts(f"2024-06-01 00:$m%02d:00")
    val ev = Seq((1L, "view", t(1)), (2L, "view", t(2)))
      .toDF("user_id", "event_type", "ts")
    val got = TemporalOps.funnelSteps(ev,
        Seq("view", "click", "purchase"))
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 2L, 1000000L), (1L, 0L, 0L),
      (2L, 0L, 0L)))
  }

  test("retentionCohorts: planted cohort matrix") {
    import spark.implicits._
    // 2024-01-01 is a Monday; epoch-week w0 = datediff/7 of that week.
    // cohort A (w0): u1 active w0+w1+w2, u2 active w0 only.
    // cohort B (w1): u3 active w1+w3 (offset 2 skipped).
    def d(s: String) = ts(s + " 12:00:00")
    val ev = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-08")), (1L, d("2024-01-15")),
      (2L, d("2024-01-02")),
      (3L, d("2024-01-10")), (3L, d("2024-01-24")))
      .toDF("user_id", "ts")
    val got = TemporalOps.retentionCohorts(ev, maxOffset = 3)
      .orderBy($"cohort_wk", $"k").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // cohorts normalize to relative weeks by construction of the data
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 1000000L),  // A week 0: both users
      (1L, 1L, 2L, 500000L),   // A week 1: u1 only
      (2L, 1L, 2L, 500000L),   // A week 2: u1 only
      (0L, 1L, 1L, 1000000L),  // B week 0: u3
      (2L, 1L, 1L, 1000000L))) // B week 2: u3 (skipped week 1)
  }

  test("anomalyWindows: planted spike flagged, steady hours clean") {
    import spark.implicits._
    // 30 hours at ~10 events/hour with a tiny deterministic wobble,
    // then hour 30 spikes to 60 — far beyond 3σ of the trailing 24
    val ev = (0 until 31).flatMap { h =>
      val cnt = if (h == 30) 60 else 10 + (h % 3) // 10,11,12 wobble
      (0 until cnt).map(i =>
        (1L, Timestamp.valueOf(f"2024-03-0${1 + h / 24}%d " +
          f"${h % 24}%02d:0${i % 6}%d:00")))
    }.toDF("user_id", "ts").withColumn("event_type",
        org.apache.spark.sql.functions.lit("view"))
    val got = TemporalOps.anomalyWindows(ev)
      .orderBy($"hr").collect()
      .map(r => (r.getAs[Long]("hr"), r.getAs[Long]("cnt"),
        r.getAs[Long]("n_trail"), r.getAs[Boolean]("is_anomaly")))
    // first 12 hours: no baseline, never flagged
    assert(got.take(12).forall(!_._4))
    // steady wobble hours with a full baseline: clean
    assert(got.slice(12, 30).forall(!_._4))
    // the spike: flagged against its trailing 24
    val spike = got.last
    assert(spike._2 == 60L && spike._3 == 24L && spike._4,
      s"spike row $spike")
  }
}
