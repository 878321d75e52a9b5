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
}
