package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * [[asOfJoin]] implements the as-of join (for each left row, the latest
  * right row with `rightTime <= leftTime` on the same key) — an operator
  * Spark has no built-in for. Implementation follows the scalable
  * union+window formulation rather than a range join:
  *
  *  1. union left and right into one keyed, time-ordered stream
  *     (right rows sort before left rows at equal timestamps → `<=`);
  *  2. one shuffle on the key; within each key partition, a running
  *     `last(value, ignoreNulls)` window carries the newest right value
  *     forward;
  *  3. keep only left rows.
  *
  * Cost: ONE shuffle + one sort over |L|+|R| — no per-row range probe,
  * no O(|L|·|R|) explosion, no broadcast requirement. This is the shape
  * that survives 100 TB; a naive `l JOIN r ON l.k=r.k AND r.t<=l.t`
  * + max() would shuffle the cross product of every key group.
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (ambiguous as-of value; enforced by callers, see cdc08).
  */
object TemporalOps {

  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val valSchema = org.apache.spark.sql.types.StructType(
      right.select(valueCols.map(col): _*).schema.fields)

    val rightU = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      struct(valueCols.map(col): _*).as("__val"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__row"))
    val leftU = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(valSchema).as("__val"),
      struct(leftCols.map(col): _*).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightU.unionByName(leftU)
      .withColumn("__asof", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__row.$c").as(c)) ++
          valueCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** NEAREST-event join — [[asOfJoin]]'s two-sided sibling: each left
    * row matches the right row (same key) with the smallest absolute
    * time distance, in EITHER direction; ties prefer the backward
    * (earlier-or-equal) match. The enrichment a feature pipeline
    * wants when "most recent state" is wrong for events landing just
    * before a snapshot.
    *
    * Same scalable shape as [[asOfJoin]] — union both sides, ONE
    * keyed sort, two frame aggregates over it (backward
    * last-ignore-nulls, forward first-ignore-nulls) — so the cost is
    * one shuffle of left+right on the key, never a per-row probe or
    * a non-equi join. The distance compare runs on exact
    * `unix_micros` longs (no float time arithmetic). Left rows with
    * no right rows at all keep NULL values (left-join semantics).
    * Right rows must be unique per (key, time) — same contract as
    * [[asOfJoin]] (pre-aggregate the right side to make it so). */
  def nearestJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightVal = right.select(
      (col(rightTime).cast("timestamp") +: valueCols.map(col)): _*)
    val valSchema = org.apache.spark.sql.types.StructType(
      rightVal.schema.fields.zipWithIndex.map { case (f, i) =>
        if (i == 0) f.copy(name = "__rt") else f
      })
    val rightU = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      struct(col(rightTime).cast("timestamp").as("__rt") +:
        valueCols.map(col): _*).as("__val"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__row"))
    val leftU = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(valSchema).as("__val"),
      struct(leftCols.map(col): _*).as("__row"))
    // at equal __t the right row sorts first, so backward covers
    // t_r <= t_l and forward strictly t_r > t_l
    val ord = Seq(col("__t"), col("__side"))
    val wB = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val gapTo = (v: org.apache.spark.sql.Column) =>
      abs(unix_micros(col("__t")) - unix_micros(v.getField("__rt")))
    val chosen = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(gapTo(col("__b")) <= gapTo(col("__f")), col("__b"))
      .otherwise(col("__f"))
    rightU.unionByName(leftU)
      .withColumn("__b", last(col("__val"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__val"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__n", chosen)
      .select(
        leftCols.map(c => col(s"__row.$c").as(c)) ++
          valueCols.map(c => col(s"__n.$c").as(c)) :+
          (unix_micros(col("__t")) -
            unix_micros(col("__n.__rt"))).as("gap_us"): _*)
  }

  /** Interval (range) self-join: all pairs of rows sharing `key` whose
    * timestamps lie within `maxGapMs`, canonicalized earlier→later.
    *
    * Scalable banding instead of a non-equi join: rows bucket by
    * `floor(t / maxGapMs)`; the earlier row of a qualifying pair can
    * only be in the later row's bucket or the one before, so the left
    * side is exploded into (bucket, bucket+1) and the join becomes a
    * plain equi-join on (key, bucket) — hash-partitioned, AQE-skew-safe,
    * no O(n²) key-group explosion. Each qualifying pair matches exactly
    * once (the right row's bucket hits exactly one of the two copies).
    *
    * Returns left (`a_`-prefixed) and right (`b_`-prefixed) id/time
    * columns plus the gap in ms.
    */
  def intervalSelfJoin(df: DataFrame, key: String, time: String,
      id: String, maxGapMs: Long): DataFrame = {
    val base = df.select(col(key).as("k"), col(id).as("id"),
      col(time).as("t"), unix_millis(col(time)).as("ms"))
      .withColumn("bucket", floor(col("ms") / maxGapMs))
    val a = base.select(col("k"), col("id").as("id_a"), col("t").as("t_a"),
      col("ms").as("ms_a"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = base.select(col("k"), col("id").as("id_b"), col("t").as("t_b"),
      col("ms").as("ms_b"), col("bucket"))
    a.join(b, Seq("k", "bucket"))
      .filter(col("ms_b") - col("ms_a") <= maxGapMs &&
        (col("ms_a") < col("ms_b") ||
          (col("ms_a") === col("ms_b") && col("id_a") < col("id_b"))))
      .select(col("k").as(key), col("id_a"), col("id_b"),
        (col("ms_b") - col("ms_a")).as("gap_ms"))
  }

  /** Ordered-step funnel: per user, the steps must occur in TIME
    * ORDER — step i counts a user iff some step-i event happens
    * STRICTLY AFTER that user's earliest valid step-(i−1) event (the
    * classic product-analytics windowed funnel, first-touch
    * attribution). Returns one row per step: (step, event_type,
    * n_users, conv_ppm) with conv_ppm the truncating ppm conversion
    * from the previous step (step 0 = 1000000).
    *
    * Shape at scale: one keyed min-aggregate + one equi-join per step
    * — every shuffle is on the user key, so AQE/exchange-reuse keeps
    * the chain on ONE partitioning of the (filtered) event stream;
    * per-step frames shrink monotonically (funnels only narrow). The
    * step results are 1-row aggregates; the conversion join is a
    * ≤steps-row self-join — control-plane sized, no window over an
    * unpartitioned frame (the PlanQualitySpec ban). */
  def funnelSteps(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    var stepFrames = Seq(reached)
    steps.drop(1).foreach { st =>
      reached = events.filter(col(typeCol) === st)
        .join(reached.select(col(userCol), col("_t").as("_prev")),
          Seq(userCol))
        .filter(col(tsCol) > col("_prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      stepFrames = stepFrames :+ reached
    }
    val counts = stepFrames.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
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

  /** RETENTION COHORTS — the classic product-analytics matrix at
    * event-log scale: users grouped by first-activity epoch-week
    * (days-since-1970 div 7 — calendar-system-free, replayable on
    * any engine), retention(k) = users of the cohort active again in
    * cohort-week + k, as a truncating ppm of the cohort size.
    * Shuffle story: one distinct over (user, week) — the same user
    * key every later stage reuses — then two map-side-combined
    * aggregations (per-user min for the cohort, per-(cohort, k)
    * count for the matrix); nothing is ever windowed or collected.
    * Only observed (cohort, k ≤ maxOffset) cells are emitted.
    * Returns (cohort_wk, k, n_active, n_cohort, retention_ppm). */
  def retentionCohorts(events: DataFrame,
      maxOffset: Int = 3): DataFrame =
    retentionFromGrid(activityGrid(events), maxOffset)

  /** The distinct (user_id, wk) ACTIVITY GRID — the compacted state
    * retention needs: a pure SET (≤ users × active-weeks rows, far
    * below the event log), idempotent under re-adding any slice of
    * the log, which is what makes the maintained form
    * ([[graft.streaming.IncrementalRetention]], cdc38) replay-safe
    * without a watermark. */
  def activityGrid(events: DataFrame): DataFrame =
    events.select(col("user_id"),
      expr("CAST(datediff(to_date(ts), date'1970-01-01') div 7 AS LONG)")
        .as("wk")).distinct()

  /** The cohort × offset matrix served from an [[activityGrid]] —
    * byte-shared by the one-shot (q63) and maintained (cdc38)
    * forms, so maintained == one-shot is structural. */
  def retentionFromGrid(weeks: DataFrame,
      maxOffset: Int = 3): DataFrame = {
    val cohort = weeks.groupBy("user_id")
      .agg(min(col("wk")).as("cohort_wk"))
    val sizes = cohort.groupBy("cohort_wk")
      .agg(count(lit(1)).as("n_cohort"))
    val cells = cohort.join(weeks, Seq("user_id"))
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("k"))
      .filter(col("k") <= maxOffset)
      .groupBy("cohort_wk", "k")
      .agg(count(lit(1)).as("n_active"))
    cells.join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("k"), col("n_active"),
        col("n_cohort"),
        expr("(n_active * 1000000) div n_cohort").as("retention_ppm"))
  }

  /** Windowed COUNT-ANOMALY detection — the event-stream health
    * audit: hourly event counts per type, each hour judged against
    * its own trailing `trail`-hour window; an hour is anomalous when
    * it sits more than 3 standard deviations ABOVE the trailing
    * mean. The 3σ test is exact cross-multiplied integer arithmetic
    * (no sqrt, no floats — flag iff n·cnt > s AND
    * (n·cnt − s)² > 9·(n·sumsq − s²), algebraically identical to
    * (cnt − μ)² > 9σ² with μ = s/n, σ² = (n·sumsq − s²)/n²), so both
    * engines replay the same booleans. Hours with fewer than
    * `minTrail` trailing observations report flag = false (no
    * baseline, no claim). Shuffle story: one map-side-combined
    * (type, hour) count, then a window PARTITIONED BY type — groups
    * bounded by the time range, never by event volume.
    * Returns (event_type, hr, cnt, n_trail, is_anomaly). */
  def anomalyWindows(events: DataFrame, trail: Int = 24,
      minTrail: Int = 12): DataFrame =
    anomalyFromHourly(hourlyCounts(events), trail, minTrail)

  /** The per-(type, epoch-hour) count table — the compacted state
    * the anomaly audit needs (time-bounded rows, far below the event
    * log); counts are pure sums, so the maintained form
    * ([[graft.streaming.IncrementalHourly]], cdc39) folds batches by
    * addition. Epoch-hour: timestamp→long is epoch seconds (UTC
    * session), truncating div buckets the hour — calendar-free,
    * replayable. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("hr"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"))

  /** The anomaly report served from an [[hourlyCounts]] frame —
    * byte-shared by the one-shot (q64) and maintained (cdc39)
    * forms.
    *
    * Baseline semantics — OBSERVED hours, not wall-clock: the
    * trailing window is ROWS-based over the hours the type actually
    * emitted events (`rowsBetween(-trail, -1)`), so for a type with
    * gap hours the baseline spans MORE than `trail` wall-clock hours
    * (it reaches back to the last `trail` active ones), and
    * zero-event hours are never judged — a silent outage is not an
    * "anomalously low" row, it is absent. That is the deliberate
    * choice for sparse/bursty types, where a wall-clock rangeBetween
    * baseline would often be empty and the 3σ test vacuous; callers
    * that need gap detection should densify hours upstream (join
    * against a generated hour spine) before calling this. The oracle
    * replays the same ROWS window, so engine and oracle agree by
    * construction. */
  def anomalyFromHourly(hourly: DataFrame, trail: Int = 24,
      minTrail: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-trail, -1)
    hourly
      .withColumn("n_trail", count(col("cnt")).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .select(col("event_type"), col("hr"), col("cnt"), col("n_trail"),
        (col("n_trail") >= minTrail &&
          col("n_trail") * col("cnt") > col("s") &&
          (col("n_trail") * col("cnt") - col("s")) *
            (col("n_trail") * col("cnt") - col("s")) >
            lit(9L) * (col("n_trail") * col("ss") -
              col("s") * col("s"))).as("is_anomaly"))
  }
}
