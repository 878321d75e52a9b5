package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained ordered-step funnel — q60's
  * view → click → purchase state kept current under TIME-ORDERED
  * ingest, the first ORDER-DEPENDENT member of the maintained-state
  * family (sums, sets and registers fold under any batching; a
  * funnel's "first click strictly after the first view" does not).
  * The fold is k-STEP GENERAL: `steps` may name any number ≥ 1 of
  * ordered event types; the state schema carries one tᵢ column per
  * step (t1..tk), fixed for the table's lifetime.
  *
  * Contract (the watermark-ordered ingest shape): batches arrive in
  * event-time order — every event in batch b+1 is later than every
  * batch-b event. Under it the per-user state (t1, …, tk) =
  * (first step-1 event, first step-2 event after t1, …, first step-k
  * event after tk−1) folds exactly by induction:
  *
  *  - t1 is set once, by the first batch containing the user's
  *    step-1 event (later batches cannot contain an earlier one);
  *  - while tᵢ is unset, a qualifying step-i event is either in
  *    tᵢ₋₁'s OWN batch (the strict ts > tᵢ₋₁ filter runs within the
  *    batch) or in a later batch (where EVERY event is later than
  *    tᵢ₋₁) — both reduce to "min batch step-i event with
  *    ts > tᵢ₋₁";
  *  - the all-k-in-one-batch chain works because tᵢ is computed in
  *    this fold before tᵢ₊₁ consumes it.
  *
  * Storage — funnel state is one row per user who reached step 1:
  * CORPUS-KEYED (users, not groups), so it lives in a [[CdcMerge]]
  * hash-bucketed table on `user_id`, NOT in a [[TableSwap]]
  * whole-rewrite table: a fold reads only the batch's users' buckets
  * ([[CdcMerge.readStateBuckets]] — every state row of a batch user
  * hashes into a touched bucket by construction) and upserts only
  * those buckets; scan and write ∝ touched buckets, never ∝ users.
  * `nBuckets` is recorded in table metadata on create and every fold
  * fails fast on mismatch — a caller-drifted bucket count would
  * silently miss state rows and duplicate users across buckets.
  * The fold is MONOTONE (tᵢ only ever fill nulls), so re-applying a
  * batch over state that already absorbed it is a row-level no-op —
  * which is what makes the upsert replay-safe even when a crash lands
  * between the state upsert and the watermark write. The batch-id
  * watermark (a 1-row [[TableSwap]] side table — bounded state, the
  * right tool there) short-circuits clean replays.
  *
  * cdc34 pins the 3-step fold against q60's own oracle over three
  * date-sliced batches + a replay; the spec additionally pins a
  * 4-step fold against the one-shot
  * [[graft.operators.TemporalOps.funnelSteps]]. Out-of-order ingest
  * is the documented OUT of contract — a batch violating the order
  * can under-count conversions (never invent one: filters only ever
  * require STRICTLY-later events); feed such streams through a
  * watermark sort upstream. Each fold is k user-keyed joins against
  * batch-grain aggregates. */
object IncrementalFunnel {

  private def wmTable(stateTable: String) = s"${stateTable}_wm"

  private def tCol(i: Int) = s"t${i + 1}" // 0-indexed step → t1..tk

  /** All tables the funnel maintains — for test/registration
    * cleanup. */
  def tables(stateTable: String): Seq[String] =
    Seq(stateTable, s"${stateTable}_stage",
      wmTable(stateTable), s"${wmTable(stateTable)}_stage",
      s"${wmTable(stateTable)}_old")

  /** Fold one time-ordered event batch into the funnel state.
    * `steps` and `nBuckets` must be stable for the table's lifetime
    * (the state schema carries one column per step; the bucket count
    * is checked against table metadata). */
  def applyBatch(spark: SparkSession, stateTable: String,
      batchEvents: DataFrame, steps: Seq[String], batchId: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", nBuckets: Int = 32): Unit =
    FoldTimer.timed {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    val tCols = (0 until k).map(tCol)
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
        // nBuckets validated against table metadata — a drifted count
        // would compute kbs under the wrong formula and silently skip
        // state rows
        CdcMerge.readStateBuckets(spark, stateTable, kbs,
            nBuckets = nBuckets)
          .join(batchUsers, Seq("user_id"), "left_semi")
          .select(col("user_id") +: tCols.map(col): _*)
      } else {
        val fields = org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType) +: tCols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.TimestampType))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(fields))
      }
      // ONE PASS over the batch instead of k sequential per-step
      // joins: the old chain re-joined the EVOLVING state frame per
      // step, doubling the plan subtree each step (2^k plan growth,
      // k broadcast builds and k join stages per fold — measured as
      // cdc34's dominant fixed cost in the r17 probe; guide §2.4/§3).
      // Equivalent fold: per user, replay the batch's step events in
      // (ts, step) order over the state's (t1..tk) accumulator — the
      // first step-1 event fills t1 (ascending scan ⇒ the min), and a
      // step-i event fills an unset tᵢ iff tᵢ₋₁ is set and ts > tᵢ₋₁
      // (ascending scan ⇒ the min qualifying event, including chains
      // completed within this batch). Identical to the join chain's
      // induction, event by event. Array size is per-(user, batch) —
      // bounded by the batch contract, never corpus.
      val stepIdx = steps.zipWithIndex.tail.foldLeft(
        when(col(typeCol) === steps.head, lit(0))) {
        case (acc, (st, i)) => acc.when(col(typeCol) === st, lit(i))
      }
      val perUser = batchEvents
        .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
        .select(user.as("user_id"),
          struct(col(tsCol).as("ts"), stepIdx.as("i")).as("e"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("e"))).as("_evs"))
      val init = struct(tCols.map(c => col(c).as(c)): _*)
      // _evs is null for a state user whose batch events were all
      // filtered (e.g. null ts): their accumulator passes through
      val chain = when(col("_evs").isNull, init).otherwise(aggregate(
        col("_evs"),
        init,
        (acc, e) => struct(tCols.zipWithIndex.map { case (c, i) =>
          val fill =
            if (i == 0) e.getField("i") === 0
            else e.getField("i") === i &&
              acc.getField(tCol(i - 1)).isNotNull &&
              e.getField("ts") > acc.getField(tCol(i - 1))
          coalesce(acc.getField(c), when(fill, e.getField("ts"))).as(c)
        }: _*)))
      val s = state.join(perUser, Seq("user_id"), "full_outer")
        .withColumn("_chain", chain)
        .select(col("user_id") +:
          tCols.map(c => col("_chain").getField(c).as(c)): _*)
      val updated = s
        .filter(col(tCols.head).isNotNull) // no step 1 → no state row
        .withColumn("event_type", lit("Insert"))
        .withColumn("_batch", lit(batchId))
      // state first, watermark second: a crash between the two
      // replays the batch, and the monotone fill-nulls fold makes
      // that re-application a row-level no-op
      CdcMerge.applyBatchKeyed(spark, stateTable, updated,
        keyCols = Seq("user_id"), versionCols = Seq("_batch"),
        nBuckets = nBuckets)
      import spark.implicits._
      // monotone watermark: append-commit (TableSwap.appendCommit)
      TableSwap.appendCommit(spark, Seq(batchId).toDF("_batch"), wm)
    } finally batchUsers.unpersist()
  }

  /** The q60-shaped report from the CURRENT state: per-step user
    * counts + truncating ppm conversion — one map-side-combined
    * aggregate pass over the state (∝ users who reached step 1,
    * never the event log). */
  def funnelReport(spark: SparkSession, stateTable: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val st = CdcMerge.readState(spark, stateTable)
    val counts = steps.indices.map { i =>
      st.agg(sum(col(tCol(i)).isNotNull.cast("long")).as("n_users"))
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
