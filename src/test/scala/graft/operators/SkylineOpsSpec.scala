package graft.operators

import graft.SparkSpec

/** SkylineOps: hand-checked frontiers, brute-force equivalence on a
  * fixed pseudo-random set (the losslessness of the grid prune),
  * tie handling, and mixed max/min orientation. */
class SkylineOpsSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long, Long)])
      : Set[Long] = {
    // maximize _2, _3; minimize _4
    def dom(b: (Long, Long, Long, Long),
        a: (Long, Long, Long, Long)): Boolean =
      b._2 >= a._2 && b._3 >= a._3 && b._4 <= a._4 &&
        (b._2 > a._2 || b._3 > a._3 || b._4 < a._4)
    pts.filter(p => !pts.exists(q => dom(q, p))).map(_._1).toSet
  }

  test("hand-checked 2-D max frontier") {
    import spark.implicits._
    // maximize (x, y): staircase (1,5) (3,3) (5,1) is the frontier;
    // (2,2) (1,1) dominated
    val df = Seq((1L, 1L, 5L), (2L, 3L, 3L), (3L, 5L, 1L),
      (4L, 2L, 2L), (5L, 1L, 1L)).toDF("id", "x", "y")
    val got = SkylineOps.skyline(df, "id", Seq("x", "y"), Nil)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("ties: identical points both stay on the frontier") {
    import spark.implicits._
    val df = Seq((1L, 4L, 4L), (2L, 4L, 4L), (3L, 1L, 1L))
      .toDF("id", "x", "y")
    val got = SkylineOps.skyline(df, "id", Seq("x", "y"), Nil)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("grid prune is lossless vs brute force (3-D, mixed max/min)") {
    import spark.implicits._
    // fixed pseudo-random points via integer hashing — includes
    // clusters and outliers; compare against the n² definition
    val pts = (0L until 400L).map { i =>
      (i, (i * 7919) % 97, (i * 104729) % 89, (i * 1299709) % 83)
    }
    val df = pts.toDF("id", "x", "y", "z")
    val got = SkylineOps.skyline(df, "id", Seq("x", "y"), Seq("z"))
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(pts))
    // and at a different grid resolution (prune tightness must not
    // change the answer)
    val got3 = SkylineOps.skyline(df, "id", Seq("x", "y"), Seq("z"),
      g = 3).collect().map(_.getLong(0)).toSet
    assert(got3 == brute(pts))
  }

  test("partitioned exact stage == broadcast exact stage " +
      "(big-shell fallback forced via broadcastShellLimit = 1)") {
    import spark.implicits._
    val pts = (0L until 400L).map { i =>
      (i, (i * 7919) % 97, (i * 104729) % 89, (i * 1299709) % 83)
    }
    val df = pts.toDF("id", "x", "y", "z")
    val part = SkylineOps.skyline(df, "id", Seq("x", "y"), Seq("z"),
      broadcastShellLimit = 1L).collect().map(_.getLong(0)).toSet
    assert(part == brute(pts))
    SkylineOps.unpersistShellCaches()
  }

  test("fallback on an ANTI-CORRELATED corpus (frontier ~ n): " +
      "every diagonal point survives, noise dies") {
    import spark.implicits._
    // diagonal x + y = 10000: nothing dominates anything; noise
    // points sit strictly inside and are all dominated
    val n = 2000L
    val diag = (0L until n).map(i => (i, i * 5, 10000L - i * 5))
    val noise = (0L until n).map(i => (n + i, i * 5 - i % 7 - 1,
      10000L - i * 5 - i % 5 - 1))
    val df = (diag ++ noise).toDF("id", "x", "y")
    val got = SkylineOps.skyline(df, "id", Seq("x", "y"), Nil,
      broadcastShellLimit = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(got == diag.map(_._1).toSet)
    SkylineOps.unpersistShellCaches()
  }

  test("degenerate dim (all equal) neither prunes nor crashes") {
    import spark.implicits._
    val df = Seq((1L, 5L, 7L), (2L, 3L, 7L), (3L, 9L, 7L))
      .toDF("id", "x", "y")
    val got = SkylineOps.skyline(df, "id", Seq("x"), Seq("y"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L)) // max x wins; y ties everywhere
  }
}
