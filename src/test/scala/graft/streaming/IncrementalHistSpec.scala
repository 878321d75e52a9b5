package graft.streaming

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** IncrementalHist: maintained bins == one-shot bins exactly (bins
  * are sums); watermark no-ops a replayed id; a BYPASSED replay
  * drifts (additive, like CMS, unlike the set-union sketches). Plus
  * the quantile-accuracy contract the sketch exists for: estimate
  * within one bin width of the exact quantile. */
class IncrementalHistSpec extends SparkSpec {

  private val table = "histspec_bins"
  private val (lo, hi, w) = (0L, 1000L, 20)

  private def freshTable(): Unit =
    Seq(table, s"${table}_stage", s"${table}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def vals = {
    import spark.implicits._
    // two groups with different shapes: g0 uniform 0..999, g1
    // concentrated 100..299
    ((0L until 1000L).map(i => ("g0", i)) ++
      (0L until 500L).map(i => ("g1", 100L + i % 200)))
      .toDF("grp", "v")
  }

  private def binsOf(df: org.apache.spark.sql.DataFrame) =
    SketchOps.histSketch(df, "grp", "v", lo, hi, w).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("batched fold == one-shot bins, bin-exact") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = vals.filter(pmod($"v", lit(3)) === i)
    (0 to 2).foreach(i => IncrementalHist.applyBatch(spark, table,
      part(i), "grp", "v", i.toLong, lo, hi, w))
    val got = IncrementalHist.readHist(spark, table, "grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == binsOf(vals))
    assert(got.nonEmpty)
  }

  test("quantile estimate within one bin width of exact") {
    val hist = SketchOps.histSketch(vals, "grp", "v", lo, hi, w)
    val est = SketchOps
      .histQuantiles(hist, "grp", Seq(500000L, 900000L), lo, hi, w)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("q_ppm")) ->
        (r.getAs[Long]("est"), r.getAs[Long]("bin_lo"),
          r.getAs[Long]("bin_hi"), r.getAs[Long]("n"))).toMap
    val binWidth = (hi - lo) / w
    // exact quantiles by sorting driver-side (test-scale corpus)
    val byGrp = vals.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    for (((g, q), (e, binLo, binHi, n)) <- est) {
      val truth = byGrp(g)((((n * q + 999999L) / 1000000L).max(1L)
        - 1L).toInt)
      assert(e >= binLo && e < binHi, s"$g/$q est outside its bin")
      assert(math.abs(e - truth) <= binWidth,
        s"$g/$q: est $e vs truth $truth beyond bin width $binWidth")
    }
  }

  test("out-of-domain values clamp into edge bins, count preserved") {
    import spark.implicits._
    val wild = Seq(("g", -50L), ("g", 0L), ("g", 999L), ("g", 5000L))
      .toDF("grp", "v")
    val hist = SketchOps.histSketch(wild, "grp", "v", lo, hi, w)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hist(0L) == 2L)        // -50 clamps down into bin 0
    assert(hist((w - 1).toLong) == 2L) // 5000 clamps up into bin 19
    assert(hist.values.sum == 4L)
  }

  test("replay: watermark no-op; bypassed replay DRIFTS (not idempotent)") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = vals.filter(pmod($"v", lit(3)) === i)
    IncrementalHist.applyBatch(spark, table, part(0), "grp", "v", 0L,
      lo, hi, w)
    val before = IncrementalHist.readHist(spark, table, "grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    IncrementalHist.applyBatch(spark, table, part(0), "grp", "v", 0L,
      lo, hi, w)
    assert(IncrementalHist.readHist(spark, table, "grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == before)
    // fresh id, same rows: bins DOUBLE — watermark is the only replay
    // defense for additive sketches
    IncrementalHist.applyBatch(spark, table, part(0), "grp", "v", 1L,
      lo, hi, w)
    val after = IncrementalHist.readHist(spark, table, "grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before.map { case (g, b, c) => (g, b, 2 * c) })
  }
}
