package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained ordered-step funnel — q60's
  * view → click → purchase state kept current under TIME-ORDERED
  * ingest, the first ORDER-DEPENDENT member of the maintained-state
  * family (sums, sets and registers fold under any batching; a
  * funnel's "first click strictly after the first view" does not).
  *
  * Contract (the watermark-ordered ingest shape): batches arrive in
  * event-time order — every event in batch b+1 is later than every
  * batch-b event. Under it the per-user state (t1, t2, t3) =
  * (first view, first click after t1, first purchase after t2) folds
  * exactly:
  *
  *  - t1 is set once, by the first batch containing the user's view
  *    (later batches cannot contain an earlier view);
  *  - while t2 is unset, a qualifying click is either in t1's OWN
  *    batch (the strict ts > t1 filter runs within the batch) or in
  *    a later batch (where EVERY event is later than t1) — both
  *    reduce to "min batch click with ts > t1";
  *  - t3 symmetrically against t2, including the
  *    all-three-in-one-batch chain (t2 is computed in this fold
  *    before t3 consumes it).
  *
  * Storage — funnel state is one row per user who reached step 1:
  * CORPUS-KEYED (users, not groups), so it lives in a [[CdcMerge]]
  * hash-bucketed table on `user_id`, NOT in a [[TableSwap]]
  * whole-rewrite table: a fold reads only the batch's users' buckets
  * ([[CdcMerge.readStateBuckets]] — every state row of a batch user
  * hashes into a touched bucket by construction) and upserts only
  * those buckets; scan and write ∝ touched buckets, never ∝ users.
  * The fold is MONOTONE (t1/t2/t3 only ever fill nulls), so
  * re-applying a batch over state that already absorbed it is a
  * row-level no-op — which is what makes the upsert replay-safe even
  * when a crash lands between the state upsert and the watermark
  * write. The batch-id watermark (a 1-row [[TableSwap]] side table —
  * bounded state, the right tool there) short-circuits clean
  * replays.
  *
  * cdc34 pins the fold against q60's own oracle over three
  * date-sliced batches + a replay. Out-of-order ingest is the
  * documented OUT of contract — a batch violating the order can
  * under-count conversions (never invent one: filters only ever
  * require STRICTLY-later events); feed such streams through a
  * watermark sort upstream. Each fold is three user-keyed joins
  * against batch-grain aggregates. */
object IncrementalFunnel {

  private def wmTable(stateTable: String) = s"${stateTable}_wm"

  /** All tables the funnel maintains — for test/registration
    * cleanup. */
  def tables(stateTable: String): Seq[String] =
    Seq(stateTable, s"${stateTable}_stage",
      wmTable(stateTable), s"${wmTable(stateTable)}_stage",
      s"${wmTable(stateTable)}_old")

  /** Fold one time-ordered event batch into the funnel state.
    * `nBuckets` must be stable for the table's lifetime (CdcMerge
    * contract). */
  def applyBatch(spark: SparkSession, stateTable: String,
      batchEvents: DataFrame, steps: Seq[String], batchId: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", nBuckets: Int = 32): Unit = {
    require(steps.length == 3, "funnel state schema carries 3 steps")
    val wm = wmTable(stateTable)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (spark.catalog.tableExists(wm)) {
      val last = spark.table(wm).agg(coalesce(max("_batch"), lit(-1L)))
        .collect()(0).getLong(0)
      if (batchId <= last) return
    }
    val user = col(userCol)
    // the batch's users and their state buckets (driver list bounded
    // by nBuckets, like any dynamic partition pruning)
    val batchUsers = batchEvents
      .filter(col(typeCol).isin(steps: _*))
      .select(user.as("user_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val state = if (spark.catalog.tableExists(stateTable)) {
        val kbs = batchUsers
          .select(pmod(xxhash64(col("user_id")), lit(nBuckets))
            .as("_kb")).distinct().collect().map(_.getLong(0)).toSeq
        CdcMerge.readStateBuckets(spark, stateTable, kbs)
          .join(batchUsers, Seq("user_id"), "left_semi")
          .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      } else {
        import spark.implicits._
        Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp,
          java.sql.Timestamp)].toDF("user_id", "t1", "t2", "t3")
      }
      val bv = batchEvents.filter(col(typeCol) === steps(0))
        .groupBy(user.as("user_id")).agg(min(col(tsCol)).as("bv"))
      val s1 = state.join(bv, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("t1"), col("bv")).as("t1"),
          col("t2"), col("t3"))
      val bc = batchEvents.filter(col(typeCol) === steps(1))
        .select(user.as("user_id"), col(tsCol).as("bts"))
        .join(s1.filter(col("t1").isNotNull && col("t2").isNull)
          .select(col("user_id"), col("t1")), Seq("user_id"))
        .filter(col("bts") > col("t1"))
        .groupBy("user_id").agg(min(col("bts")).as("bc"))
      val s2 = s1.join(bc, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("t1"),
          coalesce(col("t2"), col("bc")).as("t2"), col("t3"))
      val bp = batchEvents.filter(col(typeCol) === steps(2))
        .select(user.as("user_id"), col(tsCol).as("bts"))
        .join(s2.filter(col("t2").isNotNull && col("t3").isNull)
          .select(col("user_id"), col("t2")), Seq("user_id"))
        .filter(col("bts") > col("t2"))
        .groupBy("user_id").agg(min(col("bts")).as("bp"))
      val updated = s2.join(bp, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("t1"), col("t2"),
          coalesce(col("t3"), col("bp")).as("t3"))
        .filter(col("t1").isNotNull) // no step 1 → no state row
        .withColumn("event_type", lit("Insert"))
        .withColumn("_batch", lit(batchId))
      // state first, watermark second: a crash between the two
      // replays the batch, and the monotone fill-nulls fold makes
      // that re-application a row-level no-op
      CdcMerge.applyBatchKeyed(spark, stateTable, updated,
        keyCols = Seq("user_id"), versionCols = Seq("_batch"),
        nBuckets = nBuckets)
      import spark.implicits._
      TableSwap.writeStaged(spark, // 1-row watermark: bounded state
        Seq(batchId).toDF("_batch"), wm)
    } finally batchUsers.unpersist()
  }

  /** The q60-shaped report from the CURRENT state: per-step user
    * counts + truncating ppm conversion — one map-side-combined
    * aggregate pass over the state (∝ users who reached step 1,
    * never the event log). */
  def funnelReport(spark: SparkSession, stateTable: String,
      steps: Seq[String]): DataFrame = {
    require(steps.length == 3, "funnel state schema carries 3 steps")
    val st = CdcMerge.readState(spark, stateTable)
    val counts = Seq("t1", "t2", "t3").zipWithIndex.map { case (c, i) =>
      st.agg(sum(col(c).isNotNull.cast("long")).as("n_users"))
        .select(lit(i.toLong).as("step"),
          lit(steps(i)).as("event_type"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
    }.reduce(_ unionByName _)
    val prev = counts.select((col("step") + 1).as("step"),
      col("n_users").as("n_prev"))
    counts.join(prev, Seq("step"), "left_outer")
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("n_prev").isNull, lit(1000000L))
          .when(col("n_prev") === 0, lit(0L))
          .otherwise(expr("(n_users * 1000000) div n_prev"))
          .as("conv_ppm"))
  }

  /** Continuous maintenance: foreachBatch [[applyBatch]] — pair with
    * an upstream watermark sort so micro-batches respect the
    * time-ordered contract. */
  def startIngestStream(df: DataFrame, stateTable: String,
      steps: Seq[String], checkpointDir: String,
      nBuckets: Int = 32, availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, stateTable, batch, steps,
          batchId, nBuckets = nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
