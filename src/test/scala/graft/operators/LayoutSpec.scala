package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** LayoutOps: Morton key bit-correctness + the actual file-skipping
  * claim — Z-order layout prunes 2-D probe boxes where a 1-D sort
  * layout of the same data cannot. */
class LayoutSpec extends SparkSpec {

  private def spreadRef(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }

  test("mortonKey matches a bit-level reference") {
    import spark.implicits._
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 32767L, 65535L,
      21845L, 43690L)
    val in = (for (x <- vals; y <- vals) yield (x, y)).toDF("x", "y")
    val got = in.select($"x", $"y",
        LayoutOps.mortonKey($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == (spreadRef(x) | (spreadRef(y) << 1)),
        s"morton($x, $y)")
    }
    // bit-exactness of the interleave: de-interleaving recovers inputs
    assert(got.map(_._3).distinct.length == got.length)
  }

  test("zorderEvents: quantized cells in range, key total") {
    val z = LayoutOps.zorderEvents(
      Tables.load(spark, sf("sf0.001"), "events"))
    val agg = z.agg(min("qx"), max("qx"), min("qy"), max("qy"),
      count(lit(1))).collect()(0)
    assert(agg.getLong(0) >= 0 && agg.getLong(1) <= 65535)
    assert(agg.getLong(2) >= 0 && agg.getLong(3) <= 65535)
    assert(agg.getLong(4) ==
      Tables.load(spark, sf("sf0.001"), "events").count())
  }

  /** Files whose per-file (qx, qy) bounding box intersects the probe
    * box — footer-grain pruning simulated from per-file min/max. */
  private def filesHit(bbox: Seq[(Long, Long, Long, Long)],
      probe: (Long, Long, Long, Long)): Int =
    bbox.count { case (xlo, xhi, ylo, yhi) =>
      xhi >= probe._1 && xlo <= probe._2 &&
        yhi >= probe._3 && ylo <= probe._4
    }

  private def fileBboxes(dir: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("qx").as("xlo"), max("qx").as("xhi"),
        min("qy").as("ylo"), max("qy").as("yhi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  /** Write `df` as 16 equal-depth files clustered on `key` —
    * DETERMINISTIC stand-in for repartitionByRange, whose sampled
    * partition bounds depend on shared-session state (rdd-id-seeded
    * sampling) and made this suite flaky when run after other suites.
    * The unpartitioned window is test-only simulation at sf0.01, not
    * an operator. */
  private def writeClustered(df: DataFrame, key: String,
      dir: String): Unit = {
    val n = df.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(key), col("event_id"))
    df.withColumn("fid",
        (((row_number().over(w) - 1).cast("long") * 16) / n)
          .cast("int"))
      .repartition(col("fid"))
      .write.partitionBy("fid").mode("overwrite").parquet(dir)
  }

  test("Z-order layout prunes on BOTH axes; 1-D sort cannot") {
    val z = LayoutOps.zorderEvents(
      Tables.load(spark, sf("sf0.01"), "events"))
    val zDir = tmpDir("layout-z")
    val xDir = tmpDir("layout-x")
    writeClustered(z, "zkey", zDir)
    writeClustered(z, "qx", xDir)
    val zBox = fileBboxes(zDir)
    val xBox = fileBboxes(xDir)
    assert(zBox.size >= 8 && xBox.size >= 8)

    // probes constraining ONLY qy (the axis the 1-D layout ignores).
    // qy is lognormal-skewed, so fixed-position bands would miss the
    // data entirely — probe EQUI-DEPTH bands (each holds ~1/8 of the
    // rows) so every probe is a query somebody would actually run.
    val edges = z.stat.approxQuantile("qy",
      (0 to 8).map(_ / 8.0).toArray, 0.001).map(_.toLong)
    val yProbes = (0 until 8).map(i => (0L, 65535L, edges(i),
      math.max(edges(i + 1) - 1, edges(i))))
    val zHits = yProbes.map(filesHit(zBox, _)).sum
    val xHits = yProbes.map(filesHit(xBox, _)).sum
    // 1-D qx layout: each file holds a near-uniform qy sample, so a
    // band holding 1/8 of the rows hits nearly every file
    assert(xHits >= (yProbes.size * xBox.size) * 3 / 4,
      s"expected ~no qy pruning from the 1-D layout, got $xHits")
    // Z-order: strictly prunes qy bands (quadrant-bounded curve runs)
    assert(zHits < xHits,
      s"z-order should beat 1-D on qy probes: $zHits vs $xHits")

    // 2-D probes (both axes constrained): z-order prunes harder still
    val boxProbes = for {
      i <- 0 until 4; j <- 0 until 4
    } yield (i * 16384L, i * 16384L + 16383L,
      edges(j * 2), math.max(edges(j * 2 + 2) - 1, edges(j * 2)))
    val zBoxHits = boxProbes.map(filesHit(zBox, _)).sum
    val xBoxHits = boxProbes.map(filesHit(xBox, _)).sum
    // the layout writes above are deterministic (writeClustered), so
    // this comparison no longer flakes with suite order the way the
    // sampled repartitionByRange layout did (zBoxHits 74 vs 68
    // observed after other suites); strictness is safe again
    assert(zBoxHits < xBoxHits,
      s"z-order should beat 1-D on 2-D boxes: $zBoxHits vs $xBoxHits")
  }
}
