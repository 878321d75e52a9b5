package graft.streaming

import graft.SparkSpec
import graft.operators.SkylineOps
import org.apache.spark.sql.functions._

/** IncrementalSkyline: batched fold == one-shot skyline exactly;
  * replay is a NO-OP without any watermark (idempotent camp of the
  * maintained-sketch family); the state held is the frontier, not
  * the corpus. */
class IncrementalSkylineSpec extends SparkSpec {

  private val table = "skyspec_frontier"
  private val maxCols = Seq("x", "y")
  private val minCols = Seq("z")

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def pts = {
    import spark.implicits._
    (0L until 300L).map(i =>
      (i, (i * 7919) % 97, (i * 104729) % 89, (i * 1299709) % 83))
      .toDF("id", "x", "y", "z")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("batched fold == one-shot skyline") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = pts.filter(pmod($"id", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalSkyline.applyBatch(spark, table,
      part(i), "id", maxCols, minCols))
    val got = ids(IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols))
    val oneShot = ids(SkylineOps.skyline(pts, "id", maxCols, minCols))
    assert(got == oneShot)
    assert(got.nonEmpty)
  }

  test("replayed batch is a no-op WITHOUT a watermark (idempotent)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = pts.filter(pmod($"id", lit(3)) === i)
    IncrementalSkyline.applyBatch(spark, table, part(0), "id",
      maxCols, minCols)
    IncrementalSkyline.applyBatch(spark, table, part(1), "id",
      maxCols, minCols)
    val before = IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols).collect().map(_.toSeq).toSet
    // fold batch 1 AGAIN, verbatim — dominance can't change: ties
    // never dominate, dominated points get re-dominated
    IncrementalSkyline.applyBatch(spark, table, part(1), "id",
      maxCols, minCols)
    val after = IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("redelivery with CHANGED metrics keeps the state row " +
      "(deterministic survivor, not an arbitrary pool pick)") {
    import spark.implicits._
    freshTable()
    IncrementalSkyline.applyBatch(spark, table, pts, "id",
      maxCols, minCols)
    val before = IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols).collect().map(_.toSeq).toSet
    // violate the append-only contract: re-send every frontier id
    // with strictly better metrics — the fold must prefer state
    val mutated = IncrementalSkyline.readFrontier(spark, table, "id",
        maxCols, minCols)
      .select($"id", ($"x" + 1000).as("x"), ($"y" + 1000).as("y"),
        ($"z" - 1000).as("z"))
    IncrementalSkyline.applyBatch(spark, table, mutated, "id",
      maxCols, minCols)
    val after = IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("duplicate ids WITHIN a batch collapse deterministically " +
      "(max metric struct)") {
    import spark.implicits._
    freshTable()
    // two rows of id=0: (5,5,5) and (5,6,5) — max struct = (5,6,5)
    val b = Seq((0L, 5L, 5L, 5L), (0L, 5L, 6L, 5L), (1L, 9L, 1L, 9L))
      .toDF("id", "x", "y", "z")
    IncrementalSkyline.applyBatch(spark, table, b, "id",
      maxCols, minCols)
    val rows = IncrementalSkyline.readFrontier(spark, table, "id",
        maxCols, minCols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows.contains((0L, 5L, 6L, 5L)))
    assert(!rows.exists(t => t._1 == 0L && t._3 == 5L))
  }

  test("within-batch dup on a MINIMIZE dim keeps the smaller value " +
      "(the non-dominated variant)") {
    import spark.implicits._
    freshTable()
    // two rows of id=0 equal on max-dims, z=5 vs z=9: the kept
    // representative must be z=5 — a plain max(struct) would keep
    // z=9, which (9,1,9)-class dominators could then knock out
    val b = Seq((0L, 5L, 5L, 9L), (0L, 5L, 5L, 5L), (1L, 5L, 5L, 6L))
      .toDF("id", "x", "y", "z")
    IncrementalSkyline.applyBatch(spark, table, b, "id",
      maxCols, minCols)
    val rows = IncrementalSkyline.readFrontier(spark, table, "id",
        maxCols, minCols)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // id=0 survives as (5,5,5) and dominates id=1's (5,5,6)
    assert(rows == Set((0L, 5L, 5L, 5L)))
  }

  test("big-frontier write path: same frontier, no single-file " +
      "rewrite") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = pts.filter(pmod($"id", lit(3)) === i)
    // force the spread path with a tiny gate; fold twice so the
    // second fold both READS the spread state and rewrites it
    (0 to 1).foreach(i => IncrementalSkyline.applyBatch(spark, table,
      part(i), "id", maxCols, minCols, bigFrontierLimit = 4L))
    val spreadFiles = spark.table(table).inputFiles.length
    val got = ids(IncrementalSkyline.readFrontier(spark, table, "id",
      maxCols, minCols))
    freshTable()
    (0 to 1).foreach(i => IncrementalSkyline.applyBatch(spark, table,
      part(i), "id", maxCols, minCols))
    val oneFile = ids(IncrementalSkyline.readFrontier(spark, table,
      "id", maxCols, minCols))
    assert(got == oneFile)
    assert(spreadFiles > 1, s"spread write produced $spreadFiles file")
  }

  test("state is frontier-sized, not corpus-sized") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = pts.filter(pmod($"id", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalSkyline.applyBatch(spark, table,
      part(i), "id", maxCols, minCols))
    val stateRows = spark.table(table).count()
    val frontierRows =
      SkylineOps.skyline(pts, "id", maxCols, minCols).count()
    assert(stateRows == frontierRows)
    assert(stateRows < pts.count())
  }
}
