package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.GraftQuery
import graft.sources.Tables

/** Oracle-checked queries exercising the CDC operator surface
  * (SURVEY.md §2.3 "core") over the bounded replay of `events.parquet`.
  * Each wires real library operators from [[CdcOps]]; the oracle SQL
  * restates the semantics independently for DuckDB.
  */
object CdcQueries {

  private def dec12(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(12, 2))
  private val D12 = "DECIMAL(12,2)"

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // -------------------------------------------------------------- cdc01
  // Envelope projection + classification + skip filter (O1/O2/O4).
  // Scale: pure narrow projection — no shuffle, full codegen.
  private val cdc01 = GraftQuery(
    "cdc01_envelope",
    (s, dir) => {
      import s.implicits._
      CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
        .select($"event_id", $"event_type", $"gtid", $"database",
          $"table", $"content")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
        CASE event_type
          WHEN 'signup' THEN 'Insert'
          WHEN 'purchase' THEN 'Insert'
          WHEN 'click' THEN 'Update'
          WHEN 'error' THEN 'Delete'
          ELSE 'Skip' END AS event_type,
        'srv-1:' || CAST(event_id AS VARCHAR) AS gtid,
        'app' AS "database",
        'events' AS "table",
        props AS content
      FROM events
      WHERE CASE event_type
          WHEN 'signup' THEN 'Insert'
          WHEN 'purchase' THEN 'Insert'
          WHEN 'click' THEN 'Update'
          WHEN 'error' THEN 'Delete'
          ELSE 'Skip' END <> 'Skip'
      ORDER BY event_id"""))

  // -------------------------------------------------------------- cdc02
  // JSON payload extraction (O6 inverse: from_json/get_json_object) + agg.
  private val cdc02 = GraftQuery(
    "cdc02_json_extract",
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // -------------------------------------------------------------- cdc03
  // Composable filter chain (O7/O8): predicate filter → derived column →
  // redaction, mirroring the reference's RedactFilter/SizeFilter intent
  // (reference tests/integration/simple_integration_test.py:15-106).
  private val cdc03 = GraftQuery(
    "cdc03_filter_chain",
    (s, dir) => {
      import s.implicits._
      val chain = CdcOps.FilterChain.of(
        _.filter($"event_type" === "purchase"),
        _.withColumn("value_bucket",
          when($"value" >= 100.0, "high")
            .when($"value" >= 10.0, "mid")
            .otherwise("low")),
        _.withColumn("props",
          when($"value" >= 100.0, lit("""{"redacted":true}"""))
            .otherwise($"props")))
      chain(events(s, dir))
        .select($"event_id", $"user_id", $"value_bucket", $"props")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id,
        CASE WHEN value >= 100.0 THEN 'high'
             WHEN value >= 10.0 THEN 'mid'
             ELSE 'low' END AS value_bucket,
        CASE WHEN value >= 100.0 THEN '{"redacted":true}'
             ELSE props END AS props
      FROM events
      WHERE event_type = 'purchase'
      ORDER BY event_id"""))

  // -------------------------------------------------------------- cdc04
  // Latest-state materialization: deterministic dedup to one row per key
  // (the batch analogue of dropDuplicatesWithinWatermark; row_number
  // instead of dropDuplicates so the survivor is well-defined).
  // Scale: single shuffle on user_id; WindowGroupLimit keeps one row
  // per key instead of full partition sorts.
  private val cdc04 = GraftQuery(
    "cdc04_dedup_latest",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_event_type"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_seen"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id AS last_event_id,
             event_type AS last_event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) x
      WHERE rn = 1
      ORDER BY user_id"""))

  // -------------------------------------------------------------- cdc05
  // Tumbling-window aggregation (event-time, hourly) — the bounded twin
  // of `groupBy(window($"ts", "1 hour"))` in the streaming pipeline.
  private val cdc05 = GraftQuery(
    "cdc05_tumbling_window",
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec12($"value")).cast("double").as("total_value"))
        .orderBy($"hour_start", $"event_type")
    },
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS $D12)) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_start, event_type"""))

  // -------------------------------------------------------------- cdc06
  // Gap-based sessionization (session window, 24h inactivity gap):
  // lag → new-session flag → running sum = session id → per-session agg.
  // Scale: two window passes over one shuffle on user_id, then a
  // partial-aggregated groupBy — the classic scalable sessionize shape.
  private val cdc06 = GraftQuery(
    "cdc06_sessionize",
    (s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      val gapMs = 24L * 3600 * 1000
      events(s, dir)
        .withColumn("prev_ms",
          lag(unix_millis($"ts"), 1).over(byUser))
        .withColumn("new_sess",
          when($"prev_ms".isNull ||
            unix_millis($"ts") - $"prev_ms" > gapMs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum($"new_sess").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          sum(dec12($"value")).cast("double").as("session_value"))
        .orderBy($"user_id", $"session_id")
    },
    Some(s"""
      WITH lagged AS (
        SELECT user_id, event_id, ts, value,
               LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_ms
        FROM events),
      flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL
                         OR epoch_ms(ts) - prev_ms > 86400000
                       THEN 1 ELSE 0 END AS new_sess
        FROM lagged),
      sess AS (
        SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             CAST(SUM(CAST(value AS $D12)) AS DOUBLE) AS session_value
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  // -------------------------------------------------------------- cdc07
  // Claim-check projection (O13, reference `streams/sqs.py:250-302`):
  // messages over the size limit are replaced by a reference stub and
  // flagged oversized=true. The byte-exact packing lives in
  // graft.streaming.BatchPacker; this is its declarative, pushdown-able
  // projection form. Threshold 60B chosen so the test data exercises
  // both branches.
  private val cdc07 = GraftQuery(
    "cdc07_claim_check",
    (s, dir) => {
      import s.implicits._
      val payload = concat(
        lit("""{"event_id":"""), $"event_id",
        lit(""","event_type":""""), $"event_type",
        lit("\",\"props\":"), $"props", lit("}"))
      events(s, dir)
        .withColumn("body", payload)
        .select($"event_id",
          (length($"body") > 60).as("oversized"),
          when(length($"body") > 60,
            concat(lit("""{"original_size_exceeded":true,"message_id":"""),
              $"event_id", lit("}")))
            .otherwise($"body").as("body"))
        .orderBy($"event_id")
    },
    Some("""
      WITH prepared AS (
        SELECT event_id,
          '{"event_id":' || CAST(event_id AS VARCHAR)
            || ',"event_type":"' || event_type
            || '","props":' || props || '}' AS body
        FROM events)
      SELECT event_id,
        LENGTH(body) > 60 AS oversized,
        CASE WHEN LENGTH(body) > 60
             THEN '{"original_size_exceeded":true,"message_id":'
                  || CAST(event_id AS VARCHAR) || '}'
             ELSE body END AS body
      FROM prepared
      ORDER BY event_id"""))

  // -------------------------------------------------------------- cdc10
  // Update-event before/after envelope (reference
  // tests/unit/datasources/test_mysql.py:354-359): Update ops carry
  // `{"before": ..., "after": ...}` payloads; the before image is the
  // user's previous payload (lag), null for the first change.
  private val cdc10 = GraftQuery(
    "cdc10_update_envelope",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, dir)
        .withColumn("op", CdcOps.classifyOp($"event_type"))
        .withColumn("prev_props", lag($"props", 1).over(w))
        .filter($"op" === "Update")
        .select($"event_id",
          concat(lit("srv-1:"), $"event_id").as("gtid"),
          concat(lit("""{"before":"""),
            coalesce($"prev_props", lit("null")),
            lit(""","after":"""), $"props", lit("}")).as("content"))
        .orderBy($"event_id")
    },
    Some("""
      WITH lagged AS (
        SELECT event_id, event_type, props,
          LAG(props, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_props
        FROM events)
      SELECT event_id,
        'srv-1:' || CAST(event_id AS VARCHAR) AS gtid,
        '{"before":' || COALESCE(prev_props, 'null')
          || ',"after":' || props || '}' AS content
      FROM lagged
      WHERE CASE event_type
          WHEN 'signup' THEN 'Insert'
          WHEN 'purchase' THEN 'Insert'
          WHEN 'click' THEN 'Update'
          WHEN 'error' THEN 'Delete'
          ELSE 'Skip' END = 'Update'
      ORDER BY event_id"""))

  // -------------------------------------------------------------- cdc11
  // Typed before/after views (SURVEY §1.4 two-tier contract): cdc10
  // synthesizes the Update envelope content; this reads it BACK OUT
  // through CdcOps.typedUpdateView with a declared payload schema —
  // write-side serialize and read-side typed projection round-trip
  // under one oracle. First changes have null before → null typed
  // column, and `k_changed` uses null-safe comparison.
  private val cdc11 = GraftQuery(
    "cdc11_typed_update_view",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val envelopes = events(s, dir)
        .withColumn("op", CdcOps.classifyOp($"event_type"))
        .withColumn("prev_props", lag($"props", 1).over(w))
        .filter($"op" === "Update")
        .select($"event_id",
          concat(lit("""{"before":"""),
            coalesce($"prev_props", lit("null")),
            lit(""","after":"""), $"props", lit("}")).as("content"))
      val payload = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      CdcOps.typedUpdateView(envelopes, payload)
        .select($"event_id",
          $"before.k".as("before_k"),
          $"after.k".as("after_k"),
          (!($"before.k" <=> $"after.k")).as("k_changed"))
        .orderBy($"event_id")
    },
    Some("""
      WITH lagged AS (
        SELECT event_id, event_type, props,
          LAG(props, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_props
        FROM events)
      SELECT event_id,
        CAST(json_extract_string(prev_props, '$.k') AS BIGINT) AS before_k,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS after_k,
        CAST(json_extract_string(prev_props, '$.k') AS BIGINT)
          IS DISTINCT FROM
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_changed
      FROM lagged
      WHERE CASE event_type
          WHEN 'signup' THEN 'Insert'
          WHEN 'purchase' THEN 'Insert'
          WHEN 'click' THEN 'Update'
          WHEN 'error' THEN 'Delete'
          ELSE 'Skip' END = 'Update'
      ORDER BY event_id"""))

  // -------------------------------------------------------------- cdc12
  // SCD2 validity intervals: each change row gets [valid_from,
  // valid_to) from its own ts and the NEXT change of the same key
  // (lead), with the newest row open-ended — the standard "type 2
  // slowly changing dimension" view every CDC consumer builds. One
  // shuffle on the key, one window pass.
  private val cdc12 = GraftQuery(
    "cdc12_scd2_intervals",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, dir)
        .withColumn("op", CdcOps.classifyOp($"event_type"))
        .filter($"op" =!= "Skip")
        .select($"user_id", $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(lead($"ts", 1).over(w), "yyyy-MM-dd HH:mm:ss")
            .as("valid_to"),
          (lead($"ts", 1).over(w).isNull).as("is_current"))
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      WITH ch AS (
        SELECT user_id, event_id, ts,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END <> 'Skip')
      SELECT user_id, event_id, k,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        strftime(LEAD(ts, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS valid_to,
        LEAD(ts, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) IS NULL AS is_current
      FROM ch
      ORDER BY user_id, event_id"""))

  // -------------------------------------------------------------- cdc13
  // Sliding-window aggregation (2h window, 1h slide): each event lands
  // in len/slide windows via Spark's native window() Expand — the
  // overlapping-window twin of cdc05. Oracle enumerates each event's
  // two member windows with unnest(range).
  private val cdc13 = GraftQuery(
    "cdc13_sliding_window",
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec12($"value")).cast("double").as("total_value"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss")
            .as("w_start"),
          $"event_type", $"n", $"total_value")
        .orderBy($"w_start", $"event_type")
    },
    Some(s"""
      WITH ex AS (
        SELECT to_timestamp(
                 (epoch_ms(ts) // 1000 // 3600 - k) * 3600) AS w_start,
               event_type, value
        FROM events, (SELECT unnest(range(0, 2)) AS k) ks)
      SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS $D12)) AS DOUBLE) AS total_value
      FROM ex
      GROUP BY 1, 2
      ORDER BY w_start, event_type"""))

  // -------------------------------------------------------------- cdc14
  // Native session_window (24h gap): Spark's built-in gap-window
  // operator — the engine-level twin of cdc06's manual lag+sum
  // sessionize. window.start = first event, window.end = LAST event +
  // gap (the session's expiry time); the oracle replays the gap logic
  // and computes the same boundaries, proving the built-in agrees with
  // first principles.
  private val cdc14 = GraftQuery(
    "cdc14_session_window",
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(session_window($"ts", "24 hours"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(dec12($"value")).cast("double").as("session_value"))
        .select($"user_id",
          date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          date_format($"session_window.end", "yyyy-MM-dd HH:mm:ss")
            .as("session_expiry"),
          $"n_events", $"session_value")
        .orderBy($"user_id", $"session_start")
    },
    Some(s"""
      WITH lagged AS (
        SELECT user_id, event_id, ts, value,
               LAG(epoch_ms(ts), 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_ms
        FROM events),
      flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL
                         OR epoch_ms(ts) - prev_ms >= 86400000
                       THEN 1 ELSE 0 END AS new_sess
        FROM lagged),
      sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS session_id
        FROM flagged)
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(MAX(ts) + INTERVAL 24 HOUR,
                      '%Y-%m-%d %H:%M:%S') AS session_expiry,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS $D12)) AS DOUBLE) AS session_value
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""))

  // -------------------------------------------------------------- cdc16
  // CDC apply/merge: materialize the change stream into a
  // continuously-maintained latest-state table (CdcMerge). The query
  // replays the envelope stream as THREE micro-batches plus a
  // REDELIVERED batch (the at-least-once case), merges each into the
  // hash-partitioned state table, and reads the converged state back —
  // which must equal the one-shot SQL latest-state answer with deleted
  // keys absent. Tombstones make the redelivery a no-op; see
  // CdcMerge's scaladoc for the partition-overwrite merge shape.
  private val cdc16 = GraftQuery(
    "cdc16_merge_apply",
    (s, dir) => {
      import s.implicits._
      val table = "cdc16_state"
      graft.streaming.CdcMerge.dropStateTable(s, table)
      graft.streaming.CdcMerge.dropStateTable(s, s"${table}_stage")
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(part(0), part(1), part(2), part(1)).foreach { b =>
        graft.streaming.CdcMerge.applyBatch(
          s, table, b, "user_id", Seq("ts", "event_id"), nBuckets = 8)
      }
      graft.streaming.CdcMerge.readState(s, table)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_op"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_seen"))
        .orderBy($"user_id")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip')
      SELECT user_id, event_id AS last_event_id, op AS last_op,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
      FROM r WHERE rn = 1 AND op <> 'Delete'
      ORDER BY user_id"""))

  // -------------------------------------------------------------- cdc17
  // Schema-drift report (SchemaDrift.driftReport): upstream DDL shows
  // up as new/missing content keys, never as a broken pipeline. The
  // query PLANTS drift deterministically — click events get a new
  // `ts_ms` key (and lose `k`), high-value events grow a `surge` key —
  // then reports every key's observation count classified against the
  // declared view {k, user_agent} (user_agent is declared-but-absent →
  // `missing`). Oracle restates both the planting and the report.
  private val cdc17 = GraftQuery(
    "cdc17_drift_report",
    (s, dir) => {
      import s.implicits._
      val planted = events(s, dir).withColumn("content",
        when($"event_type" === "click",
          concat(lit("{\"ts_ms\":"), $"event_id".cast("string"), lit("}")))
          .when($"value" >= 100,
            concat(lit("{\"k\":"), get_json_object($"props", "$.k"),
              lit(",\"surge\":true}")))
          .otherwise($"props"))
      SchemaDrift.driftReport(planted, "content", Seq("k", "user_agent"))
        .orderBy($"key")
    },
    Some("""
      WITH planted AS (
        SELECT CASE
          WHEN event_type = 'click'
            THEN '{"ts_ms":' || CAST(event_id AS VARCHAR) || '}'
          WHEN value >= 100
            THEN '{"k":' || json_extract_string(props, '$.k')
                 || ',"surge":true}'
          ELSE props END AS content
        FROM events),
      observed AS (
        SELECT unnest(json_keys(content)) AS key FROM planted),
      counts AS (
        SELECT key, COUNT(*) AS n_events FROM observed GROUP BY key),
      declared AS (SELECT unnest(['k', 'user_agent']) AS key)
      SELECT COALESCE(c.key, d.key) AS key,
             CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
             CASE WHEN d.key IS NULL THEN 'new'
                  WHEN c.key IS NULL THEN 'missing'
                  ELSE 'declared' END AS status
      FROM counts c FULL OUTER JOIN declared d ON c.key = d.key
      ORDER BY key"""))

  // -------------------------------------------------------------- cdc18
  // Incremental aggregate maintenance (IncrementalAgg): a per-group
  // (n_live, sum_value) materialized view over the merged latest-state
  // table, updated from each batch's state TRANSITION (new − old
  // contributions; tombstones contribute zero) — never by rescanning
  // state. Same replay schedule as cdc16 (three batches + a
  // redelivered one); the batch watermark + transition-derived deltas
  // make the redelivery a no-op. The grouping column is the value
  // bucket, so updates that move a row between buckets exercise the
  // debit-old/credit-new path. Must equal the one-shot SQL aggregate
  // over the final live state.
  private val cdc18 = GraftQuery(
    "cdc18_incremental_agg",
    (s, dir) => {
      import s.implicits._
      val state = "cdc18_state"
      val agg = "cdc18_agg"
      Seq(state, s"${state}_stage", agg, s"${agg}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
        .withColumn("vbucket",
          when($"value" >= 100, "high")
            .when($"value" >= 10, "mid").otherwise("low"))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      // batches 0,1,2 then batch 1 REDELIVERED with its original id
      Seq(0 -> part(0), 1 -> part(1), 2 -> part(2), 1 -> part(1))
        .foreach { case (id, b) =>
          graft.streaming.IncrementalAgg.applyBatch(s, state, agg, b,
            "user_id", Seq("ts", "event_id"), nBuckets = 8,
            groupCol = "vbucket", valueCol = "value", batchId = id)
        }
      graft.streaming.IncrementalAgg.readAgg(s, agg)
        .select($"vbucket", $"n_live",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"vbucket")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts, value,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip'),
      live AS (SELECT * FROM r WHERE rn = 1 AND op <> 'Delete')
      SELECT CASE WHEN value >= 100 THEN 'high'
                  WHEN value >= 10 THEN 'mid'
                  ELSE 'low' END AS vbucket,
             CAST(COUNT(*) AS BIGINT) AS n_live,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_value
      FROM live
      GROUP BY 1 ORDER BY vbucket"""))

  // -------------------------------------------------------------- cdc19
  // Change-data-feed over the merge (ChangeFeed): every commit records
  // the row-level VISIBLE-STATE diff it caused — insert / delete /
  // update pre+post pairs in a `_commit`-partitioned feed table — so
  // downstream consumers read incremental diffs instead of re-diffing
  // snapshots. Same replay schedule as cdc16 (three batches + batch 1
  // REDELIVERED under its original id): the redelivery must leave the
  // feed untouched (the merge no-ops → empty diff → the dynamic
  // partition overwrite writes nothing). The oracle recomputes each
  // commit's diff from scratch as visible-state-after-k minus
  // visible-state-after-(k-1).
  private val cdc19 = GraftQuery(
    "cdc19_change_feed",
    (s, dir) => {
      import s.implicits._
      val state = "cdc19_state"
      val feed = "cdc19_feed"
      Seq(state, s"${state}_stage", feed)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(0 -> part(0), 1 -> part(1), 2 -> part(2), 1 -> part(1))
        .foreach { case (id, b) =>
          graft.streaming.ChangeFeed.applyBatch(s, state, feed, b,
            "user_id", Seq("ts", "event_id"), nBuckets = 8,
            batchId = id)
        }
      s.table(feed)
        .select($"_commit".cast("long").as("_commit"), $"_change_type",
          $"user_id", $"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("seen"))
        .orderBy($"_commit", $"user_id", $"_change_type")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      f AS (SELECT * FROM env WHERE op <> 'Skip'),
      v0 AS (SELECT user_id, event_id, ts FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM f WHERE event_id % 3 <= 0)
        WHERE rn = 1 AND op <> 'Delete'),
      v1 AS (SELECT user_id, event_id, ts FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM f WHERE event_id % 3 <= 1)
        WHERE rn = 1 AND op <> 'Delete'),
      v2 AS (SELECT user_id, event_id, ts FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM f WHERE event_id % 3 <= 2)
        WHERE rn = 1 AND op <> 'Delete'),
      chg AS (
        SELECT 0 AS c, 'insert' AS t, user_id, event_id, ts FROM v0
        UNION ALL
        SELECT 1, 'insert', n.user_id, n.event_id, n.ts
        FROM v1 n LEFT JOIN v0 o USING (user_id) WHERE o.user_id IS NULL
        UNION ALL
        SELECT 1, 'delete', o.user_id, o.event_id, o.ts
        FROM v0 o LEFT JOIN v1 n USING (user_id) WHERE n.user_id IS NULL
        UNION ALL
        SELECT 1, 'update_preimage', o.user_id, o.event_id, o.ts
        FROM v0 o JOIN v1 n USING (user_id)
        WHERE o.event_id <> n.event_id OR o.ts <> n.ts
        UNION ALL
        SELECT 1, 'update_postimage', n.user_id, n.event_id, n.ts
        FROM v0 o JOIN v1 n USING (user_id)
        WHERE o.event_id <> n.event_id OR o.ts <> n.ts
        UNION ALL
        SELECT 2, 'insert', n.user_id, n.event_id, n.ts
        FROM v2 n LEFT JOIN v1 o USING (user_id) WHERE o.user_id IS NULL
        UNION ALL
        SELECT 2, 'delete', o.user_id, o.event_id, o.ts
        FROM v1 o LEFT JOIN v2 n USING (user_id) WHERE n.user_id IS NULL
        UNION ALL
        SELECT 2, 'update_preimage', o.user_id, o.event_id, o.ts
        FROM v1 o JOIN v2 n USING (user_id)
        WHERE o.event_id <> n.event_id OR o.ts <> n.ts
        UNION ALL
        SELECT 2, 'update_postimage', n.user_id, n.event_id, n.ts
        FROM v1 o JOIN v2 n USING (user_id)
        WHERE o.event_id <> n.event_id OR o.ts <> n.ts)
      SELECT CAST(c AS BIGINT) AS _commit, t AS _change_type,
             user_id, event_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS seen
      FROM chg
      ORDER BY _commit, user_id, _change_type"""))

  // -------------------------------------------------------------- cdc21
  // Point-in-time state from the change feed (ChangeFeed.stateAsOf):
  // reconstruct the visible state AS OF commit 1 — i.e. after batches
  // 0 and 1 but before batch 2 — from the feed's journal alone, no
  // table snapshot. Per key the newest change at _commit <= 1 decides;
  // deletes erase. Must equal the one-shot SQL latest-state answer
  // restricted to the first two batches' events.
  private val cdc21 = GraftQuery(
    "cdc21_state_asof",
    (s, dir) => {
      import s.implicits._
      val state = "cdc21_state"
      val feed = "cdc21_feed"
      Seq(state, s"${state}_stage", feed)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(0 -> part(0), 1 -> part(1), 2 -> part(2)).foreach {
        case (id, b) =>
          graft.streaming.ChangeFeed.applyBatch(s, state, feed, b,
            "user_id", Seq("ts", "event_id"), nBuckets = 8,
            batchId = id)
      }
      graft.streaming.ChangeFeed.stateAsOf(s, feed, "user_id", 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_op"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_seen"))
        .orderBy($"user_id")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip' AND event_id % 3 <= 1)
      SELECT user_id, event_id AS last_event_id, op AS last_op,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
      FROM r WHERE rn = 1 AND op <> 'Delete'
      ORDER BY user_id"""))

  // -------------------------------------------------------------- cdc22
  // Decoupled CDF consumer (ChangeFeed.applyFeedToAggregate): a
  // derived per-group view maintained by TAILING THE FEED, never
  // reading the state table — feed rows are signed contributions
  // (insert/update_post +1, delete/update_pre −1). The query consumes
  // in two overlapping polls (commits ≤1, then "everything", twice) —
  // the commit watermark and the clamp to the feed's max commit make
  // sloppy at-least-once polling exact. Must equal the one-shot SQL
  // aggregate over the final live state.
  private val cdc22 = GraftQuery(
    "cdc22_feed_consumer",
    (s, dir) => {
      import s.implicits._
      val state = "cdc22_state"
      val feed = "cdc22_feed"
      val agg = "cdc22_view"
      Seq(state, s"${state}_stage", feed, agg, s"${agg}_stage",
        s"${agg}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(0 -> part(0), 1 -> part(1), 2 -> part(2)).foreach {
        case (id, b) =>
          graft.streaming.ChangeFeed.applyBatch(s, state, feed, b,
            "user_id", Seq("ts", "event_id"), nBuckets = 8,
            batchId = id)
      }
      val vbucket = when($"value" >= 100, "high")
        .when($"value" >= 10, "mid").otherwise("low")
      def poll(upTo: Long): Unit =
        graft.streaming.ChangeFeed.applyFeedToAggregate(s, feed, agg,
          vbucket, "value", upTo)
      poll(1); poll(Long.MaxValue); poll(Long.MaxValue) // overlap poll
      graft.streaming.ChangeFeed.readAggregate(s, agg)
        .select($"g".as("vbucket"), $"n_live",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"vbucket")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts, value,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip'),
      live AS (SELECT * FROM r WHERE rn = 1 AND op <> 'Delete')
      SELECT CASE WHEN value >= 100 THEN 'high'
                  WHEN value >= 10 THEN 'mid'
                  ELSE 'low' END AS vbucket,
             CAST(COUNT(*) AS BIGINT) AS n_live,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_value
      FROM live
      GROUP BY 1 ORDER BY vbucket"""))

  // -------------------------------------------------------------- cdc20
  // Incremental statistics maintenance (IncrementalStats): per-group
  // count/sum/min/max/avg/var_pop/stddev_pop maintained from each
  // batch's state transition. count/sum/sum² are group aggregates
  // (deletion = negated contribution); MIN/MAX take the monoid fast
  // path on inserts and a dirty-group rescan only when a removal
  // touches the stored boundary. Same replay schedule as cdc16/cdc18
  // (three batches + a redelivered one). The oracle recomputes the
  // statistics from scratch over the final live state with the q37
  // determinism recipe (×100 exact longs, closed-form doubles).
  private val cdc20 = GraftQuery(
    "cdc20_incremental_stats",
    (s, dir) => {
      import s.implicits._
      val state = "cdc20_state"
      val agg = "cdc20_agg"
      Seq(state, s"${state}_stage", agg, s"${agg}_stage",
        s"${agg}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
        .withColumn("vbucket",
          when($"value" >= 100, "high")
            .when($"value" >= 10, "mid").otherwise("low"))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(0 -> part(0), 1 -> part(1), 2 -> part(2), 1 -> part(1))
        .foreach { case (id, b) =>
          graft.streaming.IncrementalStats.applyBatch(s, state, agg, b,
            "user_id", Seq("ts", "event_id"), nBuckets = 8,
            groupCol = "vbucket", valueCol = "value", batchId = id)
        }
      graft.streaming.IncrementalStats.readStats(s, agg)
        .withColumnRenamed("g", "vbucket")
        .orderBy($"vbucket")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts, value,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip'),
      live AS (
        SELECT CASE WHEN value >= 100 THEN 'high'
                    WHEN value >= 10 THEN 'mid'
                    ELSE 'low' END AS vbucket,
               CAST(round(value * 100) AS BIGINT) AS x
        FROM r WHERE rn = 1 AND op <> 'Delete'),
      s AS (
        SELECT vbucket, COUNT(*) AS n_live,
               CAST(SUM(x) AS BIGINT) AS sv,
               SUM(CAST(x AS HUGEINT) * x) AS sq,
               MIN(x) AS mn, MAX(x) AS mx
        FROM live GROUP BY vbucket),
      d AS (
        SELECT vbucket, n_live,
               CAST(n_live AS DOUBLE) AS nd,
               CAST(sv AS DOUBLE) AS svd,
               CAST(sq AS DOUBLE) AS sqd,
               CAST(mn AS DOUBLE) AS mnd,
               CAST(mx AS DOUBLE) AS mxd
        FROM s)
      SELECT vbucket, n_live,
             svd / 100.0 AS sum_value,
             mnd / 100.0 AS min_value,
             mxd / 100.0 AS max_value,
             svd / nd / 100.0 AS avg_value,
             (sqd - svd * svd / nd) / nd / 1.0e4 AS var_pop,
             sqrt((sqd - svd * svd / nd) / nd / 1.0e4) AS stddev_pop
      FROM d
      ORDER BY vbucket"""))

  // -------------------------------------------------------------- cdc15
  // Sequence-gap audit (lost-event detection) over the purchase
  // subset's event_ids — deliberately sparse so every bucket reports.
  // See CdcOps.sequenceGaps for the scalable bucket-aggregate shape
  // (no global-sort window over row-level data).
  private val cdc15 = GraftQuery(
    "cdc15_gap_detect",
    (s, dir) => {
      import s.implicits._
      CdcOps.sequenceGaps(
        events(s, dir).filter($"event_type" === "purchase"), "event_id")
        .orderBy($"bucket")
    },
    Some("""
      WITH p AS (
        SELECT event_id FROM events WHERE event_type = 'purchase'),
      agg AS (
        SELECT event_id // 100 AS bucket, COUNT(*) AS n,
               MIN(event_id) AS mn, MAX(event_id) AS mx
        FROM p GROUP BY 1),
      g AS (
        SELECT bucket, n, mn, mx,
               mx - mn + 1 - n AS missing_inside,
               mn - LAG(mx, 1) OVER (ORDER BY bucket) - 1 AS gap_before
        FROM agg)
      SELECT bucket, n, mn, mx, missing_inside, gap_before
      FROM g
      WHERE missing_inside > 0 OR gap_before > 0
      ORDER BY bucket"""))

  // -------------------------------------------------------------- cdc23
  // Snapshot-then-tail bootstrap: how a NEW consumer actually starts —
  // an initial full load (the latest state of everything up to a
  // cutoff position, no deleted rows, like any source snapshot) seeds
  // the state table, then only the tail of the change stream is
  // replayed (two batches plus a REDELIVERED one). Because every seed
  // version ≤ the cutoff < every tail version, the seeded merge
  // converges to exactly the full-history answer without replaying
  // pre-cutoff history — the contract snapshotSeed documents. The
  // oracle is the one-shot full-history latest state (cdc16's).
  private val cdc23 = GraftQuery(
    "cdc23_snapshot_bootstrap",
    (s, dir) => {
      import s.implicits._
      val table = "cdc23_state"
      Seq(table, s"${table}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
      val cut = env.agg(expr("max(event_id) div 2").as("cut"))
      val withCut = env.crossJoin(broadcast(cut))
      val seed = graft.streaming.CdcMerge.snapshotSeed(
        withCut.filter($"event_id" <= $"cut").drop("cut"),
        "user_id", Seq("ts", "event_id"))
      graft.streaming.CdcMerge.applyBatch(
        s, table, seed, "user_id", Seq("ts", "event_id"), nBuckets = 8)
      val tail = withCut.filter($"event_id" > $"cut").drop("cut")
      def part(i: Int) = tail.filter(pmod($"event_id", lit(2)) === i)
      Seq(part(0), part(1), part(0)).foreach { b =>
        graft.streaming.CdcMerge.applyBatch(
          s, table, b, "user_id", Seq("ts", "event_id"), nBuckets = 8)
      }
      graft.streaming.CdcMerge.readState(s, table)
        .select($"user_id", $"event_id".as("last_event_id"),
          $"event_type".as("last_op"),
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_seen"))
        .orderBy($"user_id")
    },
    Some("""
      WITH env AS (
        SELECT user_id, event_id, ts,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip')
      SELECT user_id, event_id AS last_event_id, op AS last_op,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
      FROM r WHERE rn = 1 AND op <> 'Delete'
      ORDER BY user_id"""))

  // -------------------------------------------------------------- cdc24
  // Composite-key merge: latest state per (user_id, k) where k is a
  // field extracted from the change payload — the per-entity keyed
  // attribute every real CDC table has (source PKs are rarely one
  // column). Same replay schedule as cdc16 (three batches + one
  // REDELIVERED); the survivor window and bucket hash cover both key
  // columns, everything else (tombstones, idempotence, partition
  // pruning) is arity-independent.
  private val cdc24 = GraftQuery(
    "cdc24_composite_merge",
    (s, dir) => {
      import s.implicits._
      val table = "cdc24_state"
      Seq(table, s"${table}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = CdcOps.dropSkipped(CdcOps.toEnvelope(events(s, dir)))
        .withColumn("k",
          get_json_object($"content", "$.k").cast("long"))
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(part(0), part(1), part(2), part(1)).foreach { b =>
        graft.streaming.CdcMerge.applyBatchKeyed(
          s, table, b, Seq("user_id", "k"), Seq("ts", "event_id"),
          nBuckets = 8)
      }
      graft.streaming.CdcMerge.readState(s, table)
        .select($"user_id", $"k", $"event_id".as("last_event_id"),
          $"event_type".as("last_op"))
        .orderBy($"user_id", $"k")
    },
    Some("""
      WITH env AS (
        SELECT user_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          event_id, ts,
          CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END AS op
        FROM events),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, k
                    ORDER BY ts DESC, event_id DESC) AS rn
        FROM env WHERE op <> 'Skip')
      SELECT user_id, k, event_id AS last_event_id, op AS last_op
      FROM r WHERE rn = 1 AND op <> 'Delete'
      ORDER BY user_id, k"""))

  // -------------------------------------------------------------- cdc25
  // Incremental SCD2 maintenance (Scd2Merge): the cdc12 validity-
  // interval view maintained per batch instead of recomputed from the
  // full history. The replay schedule applies batch 2 BEFORE batch 1 —
  // so batch 1's events arrive LATE and must split already-closed
  // intervals — plus one redelivered batch (idempotence); the
  // converged table must equal the one-shot cdc12 chain over all
  // events. Touched keys' chains rebuild inside their pruned hash
  // partitions; the oracle is the batch formulation.
  private val cdc25 = GraftQuery(
    "cdc25_scd2_merge",
    (s, dir) => {
      import s.implicits._
      val table = "cdc25_state"
      Seq(table, s"${table}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val env = events(s, dir)
        .withColumn("op", CdcOps.classifyOp($"event_type"))
        .filter($"op" =!= "Skip")
        .select($"user_id", $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"),
          $"ts", $"op")
      def part(i: Int) = env.filter(pmod($"event_id", lit(3)) === i)
      Seq(part(0), part(2), part(1), part(2)).foreach { b =>
        graft.streaming.Scd2Merge.applyBatch(
          s, table, b, "user_id", "ts", "event_id", nBuckets = 8)
      }
      graft.streaming.Scd2Merge.readHistory(s, table)
        .select($"user_id", $"event_id", $"k",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format($"_valid_to", "yyyy-MM-dd HH:mm:ss")
            .as("valid_to"),
          $"_is_current".as("is_current"))
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      WITH ch AS (
        SELECT user_id, event_id, ts,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CASE event_type
            WHEN 'signup' THEN 'Insert'
            WHEN 'purchase' THEN 'Insert'
            WHEN 'click' THEN 'Update'
            WHEN 'error' THEN 'Delete'
            ELSE 'Skip' END <> 'Skip')
      SELECT user_id, event_id, k,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        strftime(LEAD(ts, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS valid_to,
        LEAD(ts, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) IS NULL AS is_current
      FROM ch
      ORDER BY user_id, event_id"""))

  val all: Seq[GraftQuery] =
    Seq(cdc01, cdc02, cdc03, cdc04, cdc05, cdc06, cdc07, cdc10, cdc11,
      cdc12, cdc13, cdc14, cdc15, cdc16, cdc17, cdc18, cdc19, cdc20,
      cdc21, cdc22, cdc23, cdc24, cdc25)
}
