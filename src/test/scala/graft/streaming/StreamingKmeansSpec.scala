package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Mini-batch streaming k-means: exact sum-merging across batches,
  * watermark replay no-op, decay, and batch/stream agreement. */
class StreamingKmeansSpec extends SparkSpec {

  private def vecs(rows: (Long, Array[Float])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  // two planted masses in dim 4: x-axis ids {0,2,4,5}, y-axis {1,3,6,7}
  private def batch0 = vecs(
    (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(0.5f, 0f, 0f, 0f)), (3L, Array(0f, 0.5f, 0f, 0f)))
  private def batch1 = vecs(
    (4L, Array(0.25f, 0f, 0f, 0f)), (5L, Array(1f, 0.25f, 0f, 0f)),
    (6L, Array(0f, 1f, 0f, 0f)), (7L, Array(0.25f, 0.75f, 0f, 0f)))

  private def stateOf(table: String): Map[Long, (Seq[Long], Long)] =
    TableSwap.readVersioned(spark, table)
      .select("cid", "s", "n").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toList, r.getLong(2))).toMap

  private def fresh(t: String): Unit =
    Seq(t, s"${t}_stage").foreach(CdcMerge.dropStateTable(spark, _))

  test("batch sums merge exactly; replayed batch is a no-op") {
    val t = "skm_basic"
    fresh(t)
    StreamingKmeans.applyBatch(spark, t, batch0, dim = 4, k = 2,
      batchId = 0L)
    // seeds = vecs 0,1; each mass has 2 members, fixed-point sums
    assert(stateOf(t) == Map(
      0L -> (List(1500000L, 0L, 0L, 0L), 2L),
      1L -> (List(0L, 1500000L, 0L, 0L), 2L)))
    StreamingKmeans.applyBatch(spark, t, batch1, dim = 4, k = 2,
      batchId = 1L)
    val after = Map(
      0L -> (List(2750000L, 250000L, 0L, 0L), 4L),
      1L -> (List(250000L, 3250000L, 0L, 0L), 4L))
    assert(stateOf(t) == after)
    // derived centroids are the exact means
    val ce = StreamingKmeans.readCentroids(spark, t)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toList)
      .toMap
    assert(ce(0L) == List(0.6875f, 0.0625f, 0f, 0f))
    assert(ce(1L) == List(0.0625f, 0.8125f, 0f, 0f))
    // at-least-once replay: same batchId -> watermark no-op
    StreamingKmeans.applyBatch(spark, t, batch1, dim = 4, k = 2,
      batchId = 1L)
    assert(stateOf(t) == after)
  }

  test("rational decay down-weights history with integer exactness") {
    val t = "skm_decay"
    fresh(t)
    StreamingKmeans.applyBatch(spark, t, batch0, 4, 2, 0L)
    StreamingKmeans.applyBatch(spark, t, batch1, 4, 2, 1L)
    StreamingKmeans.applyBatch(spark, t,
      vecs((8L, Array(1f, 0f, 0f, 0f))), 4, 2, 2L,
      decayNum = 1L, decayDen = 2L)
    assert(stateOf(t) == Map(
      0L -> (List(1375000L + 1000000L, 125000L, 0L, 0L), 3L),
      1L -> (List(125000L, 1625000L, 0L, 0L), 2L)))
  }

  test("half-swapped centroid table recovers; watermark intact") {
    val t = "skm_swap"
    fresh(t)
    StreamingKmeans.applyBatch(spark, t, batch0, 4, 2, 0L)
    val before = stateOf(t)
    // crash between TableSwap's renames: name gone, data under _old
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}_old")
    assert(StreamingKmeans.readCentroids(spark, t).count() == 2,
      "readCentroids did not recover the swap")
    assert(stateOf(t) == before)
    // replayed batch after recovery: watermark still skips it
    StreamingKmeans.applyBatch(spark, t, batch0, 4, 2, 0L)
    assert(stateOf(t) == before)
  }

  test("streaming path equals the batch path on the same batches") {
    val t = "skm_stream"
    fresh(t)
    val src = tmpDir("skm-src")
    batch0.coalesce(1).write.parquet(s"$src/f1")
    batch1.coalesce(1).write.parquet(s"$src/f2")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = StreamingKmeans.start(stream, t, dim = 4, k = 2,
      checkpointDir = tmpDir("skm-ck"))
    try q.awaitTermination() finally q.stop()
    assert(stateOf(t) == Map(
      0L -> (List(2750000L, 250000L, 0L, 0L), 4L),
      1L -> (List(250000L, 3250000L, 0L, 0L), 4L)))
  }
}
