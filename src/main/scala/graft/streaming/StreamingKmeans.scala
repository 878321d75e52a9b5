package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{CurationOps, SimilarityOps}

/** Mini-batch k-means over a vector STREAM: a continuously-maintained
  * centroid table updated from each micro-batch — online semantic
  * clustering for a corpus that arrives as a feed, the streaming
  * counterpart of [[graft.operators.CurationOps.kmeans]].
  *
  * State design (all integer arithmetic — deterministic under any
  * partitioning AND exactly mergeable across batches):
  *
  *  - the centroid table holds per-cluster fixed-point per-dimension
  *    SUMS (`s: array<long>`, the [[CurationOps.centroidSums]] grid)
  *    and the member count `n`, NOT the means — sums are associative,
  *    so batch contributions add exactly; the centroid is derived on
  *    read as `s / n / scale`.
  *  - each batch: assign its vectors to the CURRENT centroids
  *    (broadcast, one batch scan), then `s += s_batch, n += n_batch`.
  *    An optional rational decay `decayNum/decayDen` down-weights
  *    history first (integer `div` — still exact and engine-free), the
  *    standard mini-batch forgetting knob for drifting streams.
  *  - seeds are the first k vectors (by `vec_id`) of the first batch.
  *  - replay safety is the [[IncrementalAgg]] watermark: the table
  *    carries `_batch`; an already-applied batchId is skipped, so
  *    Spark's at-least-once foreachBatch replay is a no-op.
  *  - the table is k rows; every update is the stage-then-overwrite
  *    swap the other consumer tables use.
  *
  * Scale: per batch — one broadcast assignment scan of the BATCH (not
  * the history; history lives compressed in k·dim longs) plus a
  * k·dim-sized map-side-combined aggregate. State size is independent
  * of stream volume.
  */
object StreamingKmeans {

  /** Current centroids: (cid, n, ce: array&lt;float&gt;). */
  def readCentroids(spark: SparkSession, table: String,
      scale: Long = 1000000L): DataFrame = {
    TableSwap.recover(spark, table, s"${table}_stage")
    TableSwap.readVersioned(spark, table).select(col("cid"), col("n"),
      transform(col("s"), x =>
        (x.cast("double") / col("n").cast("double")) / scale)
        .cast("array<float>").as("ce"))
  }

  /** Merge one micro-batch of vectors (vec_id, embedding) into the
    * centroid table. */
  def applyBatch(spark: SparkSession, table: String, batch: DataFrame,
      dim: Int, k: Int, batchId: Long, scale: Long = 1000000L,
      decayNum: Long = 1L, decayDen: Long = 1L): Unit = FoldTimer.timed {
    require(decayNum >= 1 && decayDen >= decayNum,
      "decay must be a rational in (0, 1]")
    TableSwap.recover(spark, table, s"${table}_stage")
    val exists = spark.catalog.tableExists(table)
    if (exists) {
      val last = spark.table(table)
        .agg(coalesce(max("_batch"), lit(-1L))).collect()(0).getLong(0)
      if (batchId <= last) return
    }
    if (batch.isEmpty) return

    // centroids to assign against: current state, or the first k
    // vectors of the first batch (k-sized driver collect — seeds are
    // metadata, like any k-means init)
    val cents =
      if (exists) readCentroids(spark, table, scale)
        .select(col("cid"), col("ce"))
      else {
        import spark.implicits._
        batch.orderBy("vec_id").limit(k).collect()
          .zipWithIndex.map { case (r, i) =>
            (i.toLong, r.getAs[scala.collection.Seq[Float]]("embedding")
              .toArray)
          }.toSeq.toDF("cid", "ce")
      }

    val assigned = SimilarityOps.assignToCentroids(batch, cents, dim)
      .filter(col("rn") === 1)
    val batchSums = CurationOps.centroidSums(assigned, dim, scale)
      .groupBy("cid")
      .agg(max(col("n")).as("bn"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("bl"))
      .select(col("cid"), col("bn"),
        transform(col("bl"), x => x.getField("s")).as("bs"))

    val zero = array_repeat(lit(0L), dim)
    val merged =
      if (exists) {
        // decay history before adding the batch. Integer `div`, never
        // `/` (double division truncates wrong and loses exactness
        // above 2^53 — the cdc15 lesson)
        val old = TableSwap.readVersioned(spark, table)
          .select(col("cid"),
          expr(s"transform(s, x -> (x * ${decayNum}L) div ${decayDen}L)")
            .as("s"),
          expr(s"(n * ${decayNum}L) div ${decayDen}L").as("n"))
        old.join(batchSums, Seq("cid"), "full_outer")
          .select(col("cid"),
            zip_with(coalesce(col("s"), zero),
              coalesce(col("bs"), zero), (a, b) => a + b).as("s"),
            (coalesce(col("n"), lit(0L)) +
              coalesce(col("bn"), lit(0L))).as("n"))
      } else
        batchSums.select(col("cid"), col("bs").as("s"), col("bn").as("n"))
    val out = merged.withColumn("_batch", lit(batchId))

    // bound: k centroid rows (StreamingKmeansSpec pins it).
    // Full next version append-commits stamped with _batch
    // (TableSwap.appendVersioned — the IncrementalAgg commit shape,
    // identical crash contract, no per-fold staged swap)
    TableSwap.appendVersioned(spark, out, table)
  }

  /** Continuous maintenance: foreachBatch mini-batch updates of the
    * centroid table from a streaming vector DataFrame. */
  def start(df: DataFrame, table: String, dim: Int, k: Int,
      checkpointDir: String, scale: Long = 1000000L,
      decayNum: Long = 1L, decayDen: Long = 1L,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch.sparkSession, table, batch, dim, k, id,
          scale, decayNum, decayDen)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
