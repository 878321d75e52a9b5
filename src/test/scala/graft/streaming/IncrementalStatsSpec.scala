package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental min/max/variance maintenance: monoid fast path for
  * inserts, dirty-group rescan on boundary removals, watermark
  * idempotence, randomized conformance against full recompute. */
class IncrementalStatsSpec extends SparkSpec {

  private def ts(i: Long) = new Timestamp(1700000000000L + i * 1000)

  /** (key, seq, op, group, value) envelopes. */
  private def env(rows: (Long, Long, String, String, Double)*)
      : DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (k, i, op, g, v) => (k, ts(i), op, i, g, v) }
      .toDF("k", "ts", "event_type", "event_id", "grp", "value")
  }

  private def apply1(state: String, agg: String, id: Long,
      b: DataFrame): Unit =
    IncrementalStats.applyBatch(spark, state, agg, b, "k",
      Seq("ts", "event_id"), nBuckets = 4, groupCol = "grp",
      valueCol = "value", batchId = id)

  private def stats(agg: String): Map[String, (Long, Double, Double, Double)] =
    IncrementalStats.readStats(spark, agg)
      .select("g", "n_live", "sum_value", "min_value", "max_value")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  private def drop(names: String*): Unit =
    names.foreach { n =>
      Seq(n, s"${n}_stage", s"${n}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

  test("boundary delete rescans: min/max move to the survivors") {
    val (t, a) = ("ist_b", "ist_b_agg")
    drop(t, a)
    apply1(t, a, 0, env(
      (1L, 1L, "Insert", "g1", 5.00),
      (2L, 2L, "Insert", "g1", 9.25),
      (3L, 3L, "Insert", "g1", 7.50)))
    assert(stats(a) == Map("g1" -> ((3L, 21.75, 5.00, 9.25))))
    // delete the MIN row and the MAX row in one batch
    apply1(t, a, 1, env(
      (1L, 4L, "Delete", "g1", 5.00),
      (2L, 5L, "Delete", "g1", 9.25)))
    assert(stats(a) == Map("g1" -> ((1L, 7.50, 7.50, 7.50))))
  }

  test("interior removal keeps extrema; insert-only extends them") {
    val (t, a) = ("ist_i", "ist_i_agg")
    drop(t, a)
    apply1(t, a, 0, env(
      (1L, 1L, "Insert", "g1", 1.00),
      (2L, 2L, "Insert", "g1", 5.00),
      (3L, 3L, "Insert", "g1", 9.00)))
    // interior delete: extrema unchanged
    apply1(t, a, 1, env((2L, 4L, "Delete", "g1", 5.00)))
    assert(stats(a) == Map("g1" -> ((2L, 10.00, 1.00, 9.00))))
    // insert-only batch extends max without touching min
    apply1(t, a, 2, env((4L, 5L, "Insert", "g1", 12.75)))
    assert(stats(a) == Map("g1" -> ((3L, 22.75, 1.00, 12.75))))
  }

  test("group move debits old group's extremum and credits the new") {
    val (t, a) = ("ist_m", "ist_m_agg")
    drop(t, a)
    apply1(t, a, 0, env(
      (1L, 1L, "Insert", "g1", 3.00),
      (2L, 2L, "Insert", "g1", 8.00),
      (3L, 3L, "Insert", "g2", 4.00)))
    // key 2 (g1's max) moves to g2 with a new value
    apply1(t, a, 1, env((2L, 4L, "Update", "g2", 1.50)))
    assert(stats(a) == Map(
      "g1" -> ((1L, 3.00, 3.00, 3.00)),
      "g2" -> ((2L, 5.50, 1.50, 4.00))))
  }

  test("drained group disappears, then revives with fresh extrema") {
    val (t, a) = ("ist_d", "ist_d_agg")
    drop(t, a)
    apply1(t, a, 0, env((1L, 1L, "Insert", "g1", 2.00)))
    apply1(t, a, 1, env((1L, 2L, "Delete", "g1", 2.00)))
    assert(stats(a).isEmpty)
    apply1(t, a, 2, env((5L, 3L, "Insert", "g1", 6.00)))
    assert(stats(a) == Map("g1" -> ((1L, 6.00, 6.00, 6.00))))
  }

  test("redelivered batch is a watermark no-op") {
    val (t, a) = ("ist_r", "ist_r_agg")
    drop(t, a)
    val b0 = env(
      (1L, 1L, "Insert", "g1", 5.00),
      (2L, 2L, "Insert", "g1", 9.00))
    val b1 = env((1L, 3L, "Delete", "g1", 5.00))
    apply1(t, a, 0, b0); apply1(t, a, 1, b1)
    val before = stats(a)
    apply1(t, a, 1, b1) // redelivery: merge no-op AND watermark skip
    apply1(t, a, 0, b0) // out-of-order redelivery too
    assert(stats(a) == before)
    assert(before == Map("g1" -> ((1L, 9.00, 9.00, 9.00))))
  }

  test("derived stats match the closed forms") {
    val (t, a) = ("ist_v", "ist_v_agg")
    drop(t, a)
    apply1(t, a, 0, env(
      (1L, 1L, "Insert", "g1", 2.00),
      (2L, 2L, "Insert", "g1", 4.00),
      (3L, 3L, "Insert", "g1", 6.00)))
    val r = IncrementalStats.readStats(spark, a).collect()(0)
    assert(r.getAs[Double]("avg_value") == 4.0)
    // var_pop of {2,4,6} = 8/3
    assert(math.abs(r.getAs[Double]("var_pop") - 8.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("stddev_pop") -
      math.sqrt(8.0 / 3.0)) < 1e-12)
  }

  test("streaming stats maintenance converges like the batch path") {
    val (t, a) = ("ist_s", "ist_s_agg")
    drop(t, a)
    val src = tmpDir("ist-src")
    env((1L, 1L, "Insert", "g1", 2.00), (2L, 2L, "Insert", "g1", 9.00))
      .coalesce(1).write.parquet(s"$src/f1")
    env((1L, 3L, "Update", "g1", 4.00), (2L, 4L, "Delete", "g1", 9.00))
      .coalesce(1).write.parquet(s"$src/f2")
    val schema = env((0L, 0L, "Insert", "g", 0.0)).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val q = IncrementalStats.startStatsStream(stream, t, a, "k",
      Seq("ts", "event_id"), 4, "grp", "value", tmpDir("ist-ck"))
    try q.awaitTermination() finally q.stop()
    // key 2's delete removed the MAX (dirty rescan); key 1 updated
    assert(stats(a) == Map("g1" -> ((1L, 4.00, 4.00, 4.00))))
  }

  test("randomized conformance: incremental equals full recompute") {
    val (t, a) = ("ist_x", "ist_x_agg")
    drop(t, a)
    val rnd = new scala.util.Random(20260812L)
    val groups = Array("a", "b", "c")
    var seq = 0L
    var live = Map.empty[Long, (String, Double)]
    (0 until 6).foreach { batchId =>
      val ops = (0 until 12).map { _ =>
        seq += 1
        val k = rnd.nextInt(8).toLong
        if (live.contains(k) && rnd.nextBoolean() && rnd.nextBoolean()) {
          live -= k
          (k, seq, "Delete", groups(rnd.nextInt(3)),
            rnd.nextInt(1000) / 100.0)
        } else {
          val g = groups(rnd.nextInt(3))
          val v = rnd.nextInt(1000) / 100.0
          live += k -> ((g, v))
          (k, seq, if (rnd.nextBoolean()) "Insert" else "Update", g, v)
        }
      }
      apply1(t, a, batchId.toLong, env(ops: _*))
      // full recompute from the driver-side model of live state
      val expect = live.values.groupBy(_._1).map { case (g, vs) =>
        val xs = vs.map(v => math.round(v._2 * 100)).toSeq
        g -> ((xs.size.toLong, xs.sum / 100.0,
          xs.min / 100.0, xs.max / 100.0))
      }
      assert(stats(a) == expect, s"diverged at batch $batchId")
    }
  }
}
