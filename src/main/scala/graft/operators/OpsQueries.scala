package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Round-10 corpus-operations queries: token-grain fuzzy matching,
  * incremental sketch maintenance, multi-dimensional data layout and
  * distribution-drift auditing — the "operate a 100 TB corpus"
  * surface (vs the build-the-corpus surface of doc01–36). Same
  * determinism doctrine as everywhere else: all-integer outputs or
  * bit-identical double chains, total ORDER BY, truncating integer
  * ratios.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  import LlmQueries.{dotSql, normSql}

  // -------------------------------------------------------------- doc37
  // Fuzzy vocabulary pairs — SymSpell symmetric-delete blocking:
  // every pair of corpus words within Levenshtein distance 2, found
  // via an EQUI-join on ≤2-deletion variants (lossless candidate
  // superset, post-verified by the exact codegen'd levenshtein), with
  // both term frequencies. The token-grain rung of the dedup ladder:
  // a typo and its correction share no word shingles and no embedding
  // neighborhood. The oracle brute-forces all-pairs on the
  // vocabulary — V² is fine for DuckDB at test scale and pins the
  // LOSSLESSNESS of the deletion blocking, which is the entire claim.
  private val doc37 = GraftQuery(
    "doc37_fuzzy_vocab",
    (s, dir) =>
      DedupOps.fuzzyVocabPairs(t(s, dir, "documents"), maxEdit = 2)
        .orderBy(col("word_a"), col("word_b")),
    Some("""
      WITH w AS (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents),
      v AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS tf FROM w
        WHERE length(word) > 0 GROUP BY word)
      SELECT a.word AS word_a, b.word AS word_b,
        CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist,
        a.tf AS tf_a, b.tf AS tf_b
      FROM v a JOIN v b ON a.word < b.word
      WHERE levenshtein(a.word, b.word) <= 2
      ORDER BY word_a, word_b"""))

  // -------------------------------------------------------------- cdc30
  // Incrementally-maintained HLL rollup (IncrementalHll): q57's
  // per-(event_type, day) sketches maintained under batched ingest —
  // three event-disjoint batches plus a REDELIVERED batch (watermark
  // no-op; a register no-op even without it). The estimate served
  // from the maintained state must EQUAL the one-shot q57 estimate
  // (union is associative/commutative/idempotent, pinned here as
  // batched_eq_oneshot), and the oracle pins the exact counts + the
  // q57 ±5% band.
  private val cdc30 = GraftQuery(
    "cdc30_incremental_hll",
    (s, dir) => {
      import s.implicits._
      val table = "cdc30_sketches"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events")
      def part(i: Int) = ev.filter(pmod($"event_id", lit(3)) === i)
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalHll.applyBatch(s, table, part(p), id)
      }
      val est = graft.streaming.IncrementalHll.estimateByType(s, table)
      val oneShot = ev
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
        .groupBy($"event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est1"))
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_exact"))
      exact.join(est, Seq("event_type")).join(oneShot, Seq("event_type"))
        .select($"event_type", $"n_exact",
          (abs($"est" - $"n_exact") <=
            $"n_exact".cast("double") * 0.05).as("est_in_band"),
          ($"est" === $"est1").as("batched_eq_oneshot"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        TRUE AS est_in_band, TRUE AS batched_eq_oneshot
      FROM events GROUP BY event_type
      ORDER BY event_type"""))

  // -------------------------------------------------------------- q59
  // Z-order layout keys: 16-bit integer quantization of (user_id,
  // fixed-point value) + Morton bit-interleave — the multi-dim
  // clustering key a writer range-partitions on so parquet footer
  // min/max stats prune 2-D range scans on BOTH axes (1-D sort keys
  // prune only their own column). Pure BIGINT arithmetic end to end;
  // the oracle replays the mask ladder bit for bit. LayoutSpec
  // measures the actual file-skipping win against a 1-D layout.
  private val q59 = {
    def spread(v: String): String = {
      val s8 = s"((($v) | (($v) << 8)) & 16711935)"
      val s4 = s"((($s8) | (($s8) << 4)) & 252645135)"
      val s2 = s"((($s4) | (($s4) << 2)) & 858993459)"
      s"((($s2) | (($s2) << 1)) & 1431655765)"
    }
    GraftQuery(
      "q59_zorder_layout",
      (s, dir) =>
        LayoutOps.zorderEvents(t(s, dir, "events"))
          .orderBy(col("event_id")),
      Some(s"""
        WITH fixed AS (
          SELECT event_id, CAST(user_id AS BIGINT) AS x,
            CAST(FLOOR(value * 1000) AS BIGINT) AS y
          FROM events),
        ext AS (
          SELECT MIN(x) AS xlo, MAX(x) AS xhi,
            MIN(y) AS ylo, MAX(y) AS yhi
          FROM fixed),
        q AS (
          SELECT event_id,
            CAST((CAST(x - xlo AS HUGEINT) * 65535)
              // GREATEST(1, xhi - xlo) AS BIGINT) AS qx,
            CAST((CAST(y - ylo AS HUGEINT) * 65535)
              // GREATEST(1, yhi - ylo) AS BIGINT) AS qy
          FROM fixed, ext)
        SELECT event_id, qx, qy,
          (${spread("qx")}) | ((${spread("qy")}) << 1) AS zkey
        FROM q ORDER BY event_id"""))
  }

  // -------------------------------------------------------------- emb28
  // Embedding-distribution drift audit: per-dimension total-variation
  // distance (16 fixed bins over [-1, 1)) + fixed-point mean shift
  // between the even-id (reference) and odd-id (current) corpus
  // halves — the retrain-on-evidence gate for every frozen-artifact
  // consumer (IVF cells, PQ codebooks, winsorization bounds).
  // Deliberately TVD over PSI: no ln(), so the audit is exact integer
  // arithmetic, bit-identical across engines — counts cross-multiplied,
  // truncating ppm; means via the offset fixed-point trick (operands
  // kept nonnegative so Spark's truncating div and DuckDB's floor //
  // agree).
  private val embDriftOracle = """
      WITH v AS (
        SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
          CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, range(1, 65) t(i)),
      h AS (
        SELECT dim,
          LEAST(15, GREATEST(0,
            CAST(FLOOR((v + 1.0) * 8.0) AS BIGINT))) AS bin,
          vec_id % 2 = 0 AS is_ref,
          CAST(FLOOR((v + 1.0) * 1000000) AS BIGINT) AS vf
        FROM v),
      m AS (
        SELECT dim, bin,
          SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
          SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c_cur,
          SUM(CASE WHEN is_ref THEN vf ELSE 0 END) AS s_ref,
          SUM(CASE WHEN NOT is_ref THEN vf ELSE 0 END) AS s_cur
        FROM h GROUP BY dim, bin),
      tot AS (
        SELECT dim, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur,
          SUM(s_ref) AS t_ref, SUM(s_cur) AS t_cur
        FROM m GROUP BY dim),
      nm AS (
        SELECT m.dim,
          SUM(ABS(m.c_cur * t.n_ref - m.c_ref * t.n_cur)) AS numer
        FROM m JOIN tot t ON m.dim = t.dim GROUP BY m.dim)
      SELECT t.dim, CAST(t.n_ref AS BIGINT) AS n_ref,
        CAST(t.n_cur AS BIGINT) AS n_cur,
        CAST(CASE WHEN t.n_ref = 0 OR t.n_cur = 0 THEN 1000000
          ELSE (nm.numer * 1000000) // (2 * t.n_ref * t.n_cur)
          END AS BIGINT) AS tvd_ppm,
        CAST(CASE WHEN t.n_ref = 0 THEN NULL
          ELSE (t.t_ref // t.n_ref) - 1000000
          END AS BIGINT) AS mu_ref_fp,
        CAST(CASE WHEN t.n_cur = 0 THEN NULL
          ELSE (t.t_cur // t.n_cur) - 1000000
          END AS BIGINT) AS mu_cur_fp
      FROM tot t JOIN nm ON nm.dim = t.dim
      ORDER BY t.dim"""

  private val emb28 = GraftQuery(
    "emb28_embedding_drift",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      CurationOps.embeddingDrift(
          e.filter(pmod(col("vec_id"), lit(2)) === 0),
          e.filter(pmod(col("vec_id"), lit(2)) === 1))
        .orderBy(col("dim"))
    },
    Some(embDriftOracle))

  // -------------------------------------------------------------- cdc31
  // Incrementally-maintained drift monitor (IncrementalDrift): the
  // even-id half frozen as the reference histogram, the odd-id half
  // ingested in THREE vector-disjoint batches plus a REDELIVERED
  // batch (watermark no-op); the served drift report must equal
  // one-shot emb28 — emb28's own oracle IS this query's oracle
  // (histogram cells are pure sums, additive across batches; the
  // report side is byte-shared code).
  private val cdc31 = GraftQuery(
    "cdc31_incremental_drift",
    (s, dir) => {
      import s.implicits._
      val refT = "cdc31_ref"; val curT = "cdc31_hist"
      Seq(refT, s"${refT}_stage", s"${refT}_old",
          curT, s"${curT}_stage", s"${curT}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val e = t(s, dir, "embeddings")
      graft.streaming.IncrementalDrift.freezeReference(s, refT,
        e.filter(pmod($"vec_id", lit(2)) === 0))
      val cur = e.filter(pmod($"vec_id", lit(2)) === 1)
      def part(i: Int) = cur.filter(pmod($"vec_id", lit(6)) === 2 * i + 1)
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalDrift.applyBatch(s, curT, part(p), id)
      }
      graft.streaming.IncrementalDrift.driftReport(s, refT, curT)
        .orderBy($"dim")
    },
    Some(embDriftOracle))

  // -------------------------------------------------------------- q60
  // Ordered-step funnel: view → click-after-view → purchase-after-
  // click, first-touch per user, strict time order — per-step user
  // counts + truncating ppm conversion. Every shuffle is on the user
  // key (exchange-reusable chain); the conversion join is a
  // ≤3-row self-join, never an unpartitioned window.
  private val q60 = GraftQuery(
    "q60_funnel_steps",
    (s, dir) =>
      TemporalOps.funnelSteps(t(s, dir, "events"),
          Seq("view", "click", "purchase"))
        .orderBy(col("step")),
    Some("""
      WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s0 ON e.user_id = s0.user_id
          AND e.ts > s0.t
        WHERE e.event_type = 'click' GROUP BY e.user_id),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
          AND e.ts > s1.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      c AS (
        SELECT CAST(0 AS BIGINT) AS step, 'view' AS event_type,
          CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
        UNION ALL SELECT 1, 'click', COUNT(*) FROM s1
        UNION ALL SELECT 2, 'purchase', COUNT(*) FROM s2)
      SELECT c.step, c.event_type, c.n_users,
        CAST(CASE WHEN p.n_users IS NULL THEN 1000000
          WHEN p.n_users = 0 THEN 0
          ELSE (c.n_users * 1000000) // p.n_users END AS BIGINT)
          AS conv_ppm
      FROM c LEFT JOIN c p ON p.step = c.step - 1
      ORDER BY c.step"""))

  // -------------------------------------------------------------- q63
  // Retention cohorts (TemporalOps.retentionCohorts) — the classic
  // product-analytics matrix: first-activity epoch-week cohorts ×
  // week offsets, retention as truncating ppm of cohort size. One
  // (user, week) distinct + two map-side-combined aggregations; the
  // epoch-week (days div 7) is calendar-free so both engines replay
  // it exactly.
  private val retentionOracle = """
      WITH weeks AS (
        SELECT DISTINCT user_id,
          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
            AS wk
        FROM events),
      cohort AS (
        SELECT user_id, CAST(MIN(wk) AS BIGINT) AS cohort_wk
        FROM weeks GROUP BY user_id),
      sizes AS (
        SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_cohort
        FROM cohort GROUP BY cohort_wk),
      cells AS (
        SELECT c.cohort_wk, CAST(w.wk - c.cohort_wk AS BIGINT) AS k,
          CAST(COUNT(*) AS BIGINT) AS n_active
        FROM cohort c JOIN weeks w ON w.user_id = c.user_id
        WHERE w.wk - c.cohort_wk <= 3
        GROUP BY 1, 2)
      SELECT s.cohort_wk, cells.k, cells.n_active, s.n_cohort,
        (cells.n_active * 1000000) // s.n_cohort AS retention_ppm
      FROM cells JOIN sizes s ON s.cohort_wk = cells.cohort_wk
      ORDER BY s.cohort_wk, cells.k"""

  private val q63 = GraftQuery(
    "q63_retention_cohorts",
    (s, dir) =>
      TemporalOps.retentionCohorts(t(s, dir, "events"), maxOffset = 3)
        .orderBy(col("cohort_wk"), col("k")),
    Some(retentionOracle))

  // -------------------------------------------------------------- cdc38
  // Incrementally-maintained retention cohorts (IncrementalRetention)
  // — q63's matrix under event ingest via the COMPACTED-STATE
  // pattern: the state is the distinct (user, week) activity grid
  // (the minimal sufficient statistic, far below the event log),
  // folded by set union — idempotent, so the REDELIVERED batch needs
  // no watermark; the matrix recomputes grid-sized on read through
  // byte-shared retentionFromGrid. The grid is CORPUS-KEYED state,
  // so it lives in a CdcMerge-bucketed table partitioned on
  // hash(user_id) — a batch upserts only its users' buckets, never a
  // whole-grid (let alone single-task) rewrite. Served report must
  // equal one-shot q63 — q63's oracle is the gate. Batches are
  // date-sliced OUT OF ORDER (2,0,0,1) to pin that late events only
  // add cells and min week is order-free.
  private val cdc38 = GraftQuery(
    "cdc38_incremental_retention",
    (s, dir) => {
      import s.implicits._
      val table = "cdc38_grid"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events")
      def part(i: Int) =
        ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
      Seq(2, 0, 0, 1).foreach { p =>
        graft.streaming.IncrementalRetention.applyBatch(s, table,
          part(p))
      }
      graft.streaming.IncrementalRetention
        .retentionReport(s, table, maxOffset = 3)
        .orderBy(col("cohort_wk"), col("k"))
    },
    Some(retentionOracle))

  // -------------------------------------------------------------- q64
  // Windowed count-anomaly audit (TemporalOps.anomalyWindows) — the
  // event-stream health check: hourly counts per type, each hour
  // judged against its own trailing-24h window with an EXACT
  // cross-multiplied integer 3σ test (no sqrt, no floats — both
  // engines replay the same booleans); hours without a ≥12-hour
  // baseline make no claim. One (type, hour) count + a window
  // partitioned by type, groups bounded by the time range.
  private val anomalyOracle = """
      WITH hourly AS (
        SELECT event_type,
          date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts)
            AS hr,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
      tr AS (
        SELECT event_type, hr, cnt,
          CAST(COUNT(cnt) OVER w AS BIGINT) AS n_trail,
          CAST(COALESCE(SUM(cnt) OVER w, 0) AS BIGINT) AS s,
          CAST(COALESCE(SUM(cnt * cnt) OVER w, 0) AS BIGINT) AS ss
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT event_type, hr, cnt, n_trail,
        (n_trail >= 12 AND n_trail * cnt > s AND
         (n_trail * cnt - s) * (n_trail * cnt - s) >
           9 * (n_trail * ss - s * s)) AS is_anomaly
      FROM tr
      ORDER BY event_type, hr"""

  private val q64 = GraftQuery(
    "q64_anomaly_windows",
    (s, dir) =>
      TemporalOps.anomalyWindows(t(s, dir, "events"))
        .orderBy(col("event_type"), col("hr")),
    Some(anomalyOracle))

  // -------------------------------------------------------------- cdc39
  // Incrementally-maintained anomaly audit (IncrementalHourly) —
  // q64's report under event ingest via the compacted-state pattern
  // (cdc38's sibling, additive camp): state is the (type, hour)
  // count table, folded by addition per batch (watermarked — counts
  // are not idempotent), report recomputed state-sized through
  // byte-shared anomalyFromHourly. Batches are date-sliced OUT OF
  // ORDER (2,0,1) plus a REDELIVERED batch; served report must equal
  // one-shot q64 — q64's oracle is the gate.
  private val cdc39 = GraftQuery(
    "cdc39_incremental_anomaly",
    (s, dir) => {
      import s.implicits._
      val table = "cdc39_hourly"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events")
      def part(i: Int) =
        ev.filter(pmod(dayofmonth($"ts"), lit(3)) === i)
      Seq(2, 0, 0, 1).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=0 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalHourly.applyBatch(s, table,
          part(p), id)
      }
      graft.streaming.IncrementalHourly.anomalyReport(s, table)
        .orderBy(col("event_type"), col("hr"))
    },
    Some(anomalyOracle))

  // -------------------------------------------------------------- mm06
  // Media near-dup via banded perceptual hash: 32-bit byte-4-gram
  // SimHash (similarity-preserving, the pHash stand-in — mm02's
  // avalanche checksum can only catch EXACT dups), banded 4×8 for the
  // LSH candidate equi-join (lossless for Hamming ≤ 3 by pigeonhole),
  // exact bit_count(xor) verify in codegen. The image-dedup recipe
  // over the opaque binary column; the oracle replays bit votes,
  // banding and Hamming per hex digit.
  // Shared with the maintained twin (cdc47): the fold == one-shot
  // equality claim is only meaningful if both queries pin against the
  // IDENTICAL oracle text (the bm25Oracle doctrine). A def, not a
  // val: mm06 captures it during object init.
  private def phashNearDupOracle: String = {
    val bits = 32; val bands = 4; val width = bits / bands
    val gram = 4; val maxHam = 3
    val mask = (1L << width) - 1
    val phExpr = (0 until bits).map { b =>
      s"""(CASE WHEN SUM(((gv >> $b) & 1) * 2 - 1) > 0
         THEN ${1L << b} ELSE 0 END)"""
    }.mkString(" + ")
    s"""
        WITH g AS (
          SELECT doc_id,
            unnest(list_transform(
              range(1, length(text) - ${gram - 2}),
              i -> CAST(('0x' ||
                substring(md5(substring(text, i, $gram)), 1, 8))
                AS BIGINT))) AS gv
          FROM documents WHERE length(text) >= $gram),
        ph AS (
          SELECT doc_id, CAST($phExpr AS BIGINT) AS phash
          FROM g GROUP BY doc_id),
        banded AS (
          SELECT doc_id, phash, band,
            (phash >> (band * $width)) & $mask AS key
          FROM ph, range(0, $bands) t(band)),
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.phash AS pa, b.phash AS pb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key
            AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        FROM cands
        WHERE bit_count(xor(pa, pb)) <= $maxHam
        ORDER BY doc_a, doc_b"""
  }

  private val mm06 = GraftQuery(
    "mm06_phash_neardup",
    (s, dir) =>
      MultimodalOps.mediaNearDups(
          MultimodalOps.toMediaColumns(t(s, dir, "documents")),
          maxHam = 3, gram = 4, bits = 32, bands = 4)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(phashNearDupOracle))

  // -------------------------------------------------------------- q61
  // ANALYZE-style table statistics: per-column row count, null
  // count, exact NDV, banded approx-NDV (HLL++, the 100 TB mode —
  // the exact countDistincts exist to GRADE it), and min/max in
  // exact fixed-point BIGINT (doubles floored ×100, timestamps as
  // unix micros, strings ranked as strings). The stats-collection
  // pass a CBO and a pipeline-health dashboard share. One PRUNED
  // single-column scan per column (same total IO as a one-pass wide
  // scan), every aggregate two-phase — deliberately NOT one wide
  // Aggregate: N distinct-aggs in a single operator make Catalyst
  // Expand every row N× (measured 20 s → 2 s here).
  private val q61 = {
    case class ColSpec(name: String, fp: Column, isStr: Boolean)
    val cols = Seq(
      ColSpec("l_orderkey", col("l_orderkey").cast("long"), false),
      ColSpec("l_quantity",
        floor(col("l_quantity") * 100).cast("long"), false),
      ColSpec("l_extendedprice",
        floor(col("l_extendedprice") * 100).cast("long"), false),
      ColSpec("l_discount",
        floor(col("l_discount") * 100).cast("long"), false),
      ColSpec("l_shipdate", unix_micros(col("l_shipdate")), false),
      ColSpec("l_returnflag", lit(null).cast("long"), true))
    GraftQuery(
      "q61_table_stats",
      (s, dir) => {
        // one pruned single-column scan per column, NOT one wide agg:
        // N distinct-aggregates in a single Aggregate make Catalyst
        // Expand every row N× (measured 20 s vs 2 s here); per-column
        // plans each read ONE parquet column (pruned — same total IO
        // as the one-pass scan) and keep every aggregate two-phase
        val li = t(s, dir, "lineitem")
        cols.map { c =>
          val base = col(c.name)
          li.select(base.as("v"), c.fp.as("fp"))
            .agg(count(lit(1)).as("n"),
              sum(col("v").isNull.cast("long")).as("n_nulls"),
              countDistinct(col("v")).as("ndv"),
              approx_count_distinct(col("v")).as("andv"),
              min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"),
              (if (c.isStr) min(col("v").cast("string"))
               else lit(null).cast("string")).as("min_str"),
              (if (c.isStr) max(col("v").cast("string"))
               else lit(null).cast("string")).as("max_str"))
            .select(lit(c.name).as("column_name"), col("n"),
              col("n_nulls"), col("ndv"),
              (abs(col("andv") - col("ndv")) * 100 <= col("ndv") * 10)
                .as("approx_in_band"),
              col("min_fp"), col("max_fp"), col("min_str"),
              col("max_str"))
        }.reduce(_ unionByName _)
          .orderBy(col("column_name"))
      },
      Some("""
        WITH s AS (
          SELECT * FROM (VALUES
            ('l_orderkey'), ('l_quantity'), ('l_extendedprice'),
            ('l_discount'), ('l_shipdate'), ('l_returnflag'))
            t(column_name)),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS k_ndv,
            CAST(MIN(l_orderkey) AS BIGINT) AS k_min,
            CAST(MAX(l_orderkey) AS BIGINT) AS k_max,
            CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS q_ndv,
            CAST(MIN(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
              AS q_min,
            CAST(MAX(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
              AS q_max,
            CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS p_ndv,
            CAST(MIN(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS p_min,
            CAST(MAX(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS p_max,
            CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS d_ndv,
            CAST(MIN(CAST(FLOOR(l_discount * 100) AS BIGINT)) AS BIGINT)
              AS d_min,
            CAST(MAX(CAST(FLOOR(l_discount * 100) AS BIGINT)) AS BIGINT)
              AS d_max,
            CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS t_ndv,
            CAST(MIN(epoch_us(l_shipdate)) AS BIGINT) AS t_min,
            CAST(MAX(epoch_us(l_shipdate)) AS BIGINT) AS t_max,
            CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS f_ndv,
            MIN(l_returnflag) AS f_min, MAX(l_returnflag) AS f_max
          FROM lineitem)
        SELECT s.column_name, a.n, CAST(0 AS BIGINT) AS n_nulls,
          CASE s.column_name
            WHEN 'l_orderkey' THEN k_ndv WHEN 'l_quantity' THEN q_ndv
            WHEN 'l_extendedprice' THEN p_ndv
            WHEN 'l_discount' THEN d_ndv WHEN 'l_shipdate' THEN t_ndv
            ELSE f_ndv END AS ndv,
          TRUE AS approx_in_band,
          CASE s.column_name
            WHEN 'l_orderkey' THEN k_min WHEN 'l_quantity' THEN q_min
            WHEN 'l_extendedprice' THEN p_min
            WHEN 'l_discount' THEN d_min WHEN 'l_shipdate' THEN t_min
            ELSE NULL END AS min_fp,
          CASE s.column_name
            WHEN 'l_orderkey' THEN k_max WHEN 'l_quantity' THEN q_max
            WHEN 'l_extendedprice' THEN p_max
            WHEN 'l_discount' THEN d_max WHEN 'l_shipdate' THEN t_max
            ELSE NULL END AS max_fp,
          CASE s.column_name WHEN 'l_returnflag' THEN f_min
            ELSE NULL END AS min_str,
          CASE s.column_name WHEN 'l_returnflag' THEN f_max
            ELSE NULL END AS max_str
        FROM s, a
        ORDER BY s.column_name"""))
  }

  // -------------------------------------------------------------- cdc32
  // Incrementally-maintained KMV sketches (IncrementalKmv): q58's
  // set-algebra sketches folded per ingest batch — kmin_k is a
  // monotone pure set function, so the maintained sketch IS the
  // one-shot sketch of everything seen (not an approximation of it).
  // Three event-disjoint batches + a REDELIVERED batch, then the full
  // q58 overlap report served from the maintained table through the
  // byte-shared SketchOps.overlapReport — q58's own oracle is this
  // query's oracle, row for row.
  private val cdc32 = GraftQuery(
    "cdc32_incremental_kmv",
    (s, dir) => {
      import s.implicits._
      val k = 64
      val segs = Seq("click", "purchase", "view")
      val table = "cdc32_sketches"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events").filter($"event_type".isin(segs: _*))
      def part(i: Int) = ev.filter(pmod($"event_id", lit(3)) === i)
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalKmv.applyBatch(s, table, part(p),
          "event_type", "user_id", id, k)
      }
      val sketches = graft.streaming.IncrementalKmv.readSketches(s, table)
      val u = ev.select($"event_type".as("seg"), $"user_id".as("v"))
        .distinct()
      SketchOps.overlapReport(sketches, u, k)
        .orderBy($"seg_a", $"seg_b")
    },
    SelectionQueries.all.find(_.name == "q58_kmv_intersect")
      .flatMap(_.oracle))

  // -------------------------------------------------------------- doc38
  // Held-out bigram-LM scoring — doc34 without the self-grading bias:
  // the model trains only on the md5 train split (doc31 gate,
  // bucket < 204 ≈ 80%), every doc scores against that frozen model,
  // OOV bigrams contribute 0 ppm and are counted as the n_oov signal.
  private val doc38 = GraftQuery(
    "doc38_heldout_lm",
    (s, dir) =>
      CurationOps.bigramLmScoreHeldOut(t(s, dir, "documents"))
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)),
          i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
        FROM toks WHERE len(ws) >= 2),
      bgf AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
      train AS (
        SELECT doc_id FROM documents
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
          1, 2)) AS BIGINT) < 204),
      c2 AS (
        SELECT w1, w2, COUNT(*) AS c2
        FROM bgf JOIN train USING (doc_id) GROUP BY w1, w2),
      c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
      model AS (SELECT c2.w1, c2.w2,
        CAST((c2.c2 * 1000000) // c1.c1 AS BIGINT) AS p_ppm
        FROM c2 JOIN c1 USING (w1)),
      sc AS (
        SELECT b.doc_id, COUNT(*) AS n_bigrams,
          SUM(COALESCE(m.p_ppm, 0)) AS sum_ppm,
          SUM(CASE WHEN m.p_ppm IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM bgf b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        GROUP BY b.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(sc.n_oov, 0) AS BIGINT) AS n_oov,
        CAST(COALESCE(sc.sum_ppm // sc.n_bigrams, 0) AS BIGINT)
          AS avg_ppm
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc45
  // CROSS-VALIDATED held-out LM scoring — doc38 without the residual
  // self-grading (there, ~80% of docs score against a model that
  // contains them): every doc scores against the model trained on
  // the COMPLEMENT of its own md5 fold, computed by subtraction
  // (total − own-fold counts) in one counting pass instead of k
  // model builds. No document's tokens are in its scoring model.
  private val doc45 = GraftQuery(
    "doc45_cv_heldout_lm",
    (s, dir) =>
      CurationOps.bigramLmScoreCv(t(s, dir, "documents"), folds = 8)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)),
          i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
        FROM toks WHERE len(ws) >= 2),
      bgf AS (
        SELECT doc_id, p.w1 AS w1, p.w2 AS w2,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
            1, 2)) AS BIGINT) % 8 AS f
        FROM bg),
      c2f AS MATERIALIZED (
        SELECT f, w1, w2, CAST(COUNT(*) AS BIGINT) AS c2f
        FROM bgf GROUP BY f, w1, w2),
      c2t AS MATERIALIZED (
        SELECT w1, w2, CAST(SUM(c2f) AS BIGINT) AS c2t
        FROM c2f GROUP BY w1, w2),
      c1f AS (
        SELECT f, w1, CAST(SUM(c2f) AS BIGINT) AS c1f
        FROM c2f GROUP BY f, w1),
      c1t AS (
        SELECT w1, CAST(SUM(c2t) AS BIGINT) AS c1t
        FROM c2t GROUP BY w1),
      occ AS (
        SELECT b.doc_id,
          CASE WHEN t2.c2t = f2.c2f OR t1.c1t = f1.c1f THEN NULL
            ELSE ((t2.c2t - f2.c2f) * 1000000) // (t1.c1t - f1.c1f)
          END AS p_ppm
        FROM bgf b
        JOIN c2t t2 ON t2.w1 = b.w1 AND t2.w2 = b.w2
        JOIN c2f f2 ON f2.f = b.f AND f2.w1 = b.w1 AND f2.w2 = b.w2
        JOIN c1t t1 ON t1.w1 = b.w1
        JOIN c1f f1 ON f1.f = b.f AND f1.w1 = b.w1),
      sc AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
          SUM(COALESCE(p_ppm, 0)) AS sum_ppm,
          SUM(CASE WHEN p_ppm IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM occ GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(sc.n_oov, 0) AS BIGINT) AS n_oov,
        CAST(COALESCE(sc.sum_ppm // sc.n_bigrams, 0) AS BIGINT)
          AS avg_ppm
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id"""))

  // ---------------------------------------------------- doc46 / doc47
  // EXACT REPEATED-SPAN dedup (DedupOps.repeatedSpans) — the
  // exact-substring method of Lee et al. (arXiv:2107.06499) at token
  // grain: every 8-token window occurring in >= 2 distinct docs,
  // reported at every (doc_id, pos) — the deletion-candidate list.
  // The doc-level ladder cannot express this: two docs sharing one
  // boilerplate paragraph are not near-dups, but the paragraph still
  // trains twice. doc47 merges each doc's repeated spans as
  // intervals (the islands window pattern) into covered-token
  // counts and truncating-ppm coverage — the template-instance gate.
  private val doc46 = GraftQuery(
    "doc46_repeated_spans",
    (s, dir) =>
      DedupOps.repeatedSpans(t(s, dir, "documents"), spanLen = 8)
        .orderBy(col("span_key"), col("doc_id"), col("pos")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT doc_id, unnest(range(1, len(ws) - 8 + 2)) AS pos, ws
        FROM toks WHERE len(ws) >= 8),
      spk AS MATERIALIZED (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
          md5(array_to_string(ws[pos:pos+7], ' ')) AS span_key
        FROM sp),
      rep AS (
        SELECT span_key,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM spk GROUP BY span_key
        HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT s.doc_id, s.pos, s.span_key, r.n_docs, r.n_occ
      FROM spk s JOIN rep r USING (span_key)
      ORDER BY s.span_key, s.doc_id, s.pos"""))

  private val doc47 = GraftQuery(
    "doc47_span_coverage",
    (s, dir) =>
      DedupOps.spanCoverage(t(s, dir, "documents"), spanLen = 8)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT doc_id, unnest(range(1, len(ws) - 8 + 2)) AS pos, ws
        FROM toks WHERE len(ws) >= 8),
      spk AS MATERIALIZED (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
          md5(array_to_string(ws[pos:pos+7], ' ')) AS span_key
        FROM sp),
      rep AS (
        SELECT span_key FROM spk GROUP BY span_key
        HAVING COUNT(DISTINCT doc_id) >= 2),
      occ AS MATERIALIZED (
        SELECT s.doc_id, s.pos FROM spk s JOIN rep r
        USING (span_key)),
      pe AS (
        SELECT doc_id, pos,
          MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_end
        FROM occ),
      fl AS (
        SELECT doc_id, pos,
          CASE WHEN prev_end IS NULL OR pos > prev_end
            THEN 1 ELSE 0 END AS flag
        FROM pe),
      grp AS (
        SELECT doc_id, pos,
          SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS g
        FROM fl),
      ext AS (
        SELECT doc_id, g, MIN(pos) AS s, MAX(pos) + 8 AS e,
          CAST(COUNT(*) AS BIGINT) AS n_sp
        FROM grp GROUP BY doc_id, g),
      perdoc AS (
        SELECT doc_id, CAST(SUM(n_sp) AS BIGINT) AS n_spans,
          CAST(COUNT(*) AS BIGINT) AS n_islands,
          CAST(SUM(e - s) AS BIGINT) AS covered_tok
        FROM ext GROUP BY doc_id)
      SELECT t.doc_id,
        COALESCE(p.n_spans, 0) AS n_spans,
        COALESCE(p.n_islands, 0) AS n_islands,
        COALESCE(p.covered_tok, 0) AS covered_tok,
        CAST(len(t.ws) AS BIGINT) AS n_tok,
        CASE WHEN len(t.ws) = 0 THEN 0
          ELSE (COALESCE(p.covered_tok, 0) * 1000000) // len(t.ws)
        END AS coverage_ppm
      FROM toks t LEFT JOIN perdoc p USING (doc_id)
      ORDER BY t.doc_id"""))

  // -------------------------------------------------------------- cdc40
  // Incrementally-maintained repeated-span statistics
  // (IncrementalSpans) — doc46's span-level report under document
  // ingest via the APPEND pattern: state is the
  // (span_key, doc_id) → n_occ grid (the minimal sufficient
  // statistic; n_docs = rows per key, n_occ = their sum). Span keys
  // are uniform md5 hashes, so a merge-shaped bucketed table would
  // rewrite EVERY bucket on any realistic batch (the r12 weak) —
  // instead each fold appends its rows into its own _b generation
  // (write ∝ batch), idempotent via dynamic overwrite of that
  // generation + a batch watermark; the REDELIVERED batch (same id)
  // pins the replay no-op. Report = one aggregate over the grid,
  // equal to the one-shot aggregation of doc46's occurrence stream.
  private val cdc40 = GraftQuery(
    "cdc40_incremental_spans",
    (s, dir) => {
      import s.implicits._
      val table = "cdc40_spans"
      graft.streaming.IncrementalSpans.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      // (partition, batchId): batch 1 is REDELIVERED under its own id
      Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
        graft.streaming.IncrementalSpans.applyBatch(s, table,
          part(p), batchId = b)
      }
      graft.streaming.IncrementalSpans.spanReport(s, table)
        .orderBy($"span_key")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT doc_id, unnest(range(1, len(ws) - 8 + 2)) AS pos, ws
        FROM toks WHERE len(ws) >= 8),
      spk AS (
        SELECT doc_id,
          md5(array_to_string(ws[pos:pos+7], ' ')) AS span_key
        FROM sp)
      SELECT span_key,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM spk GROUP BY span_key
      HAVING COUNT(DISTINCT doc_id) >= 2
      ORDER BY span_key"""))

  // ---------------------------------------------------- doc48 / doc49
  // doc48: deterministic WEIGHTED PRIORITY SAMPLING — bottom-k by
  // the integer priority u40(doc_id) div (tokens+1): heavier docs
  // draw smaller priorities (weight-tilted subset), no RNG, one
  // pass, global top-k planned as TakeOrderedAndProject. doc49:
  // rarity-weighted keyword extraction — tf · (N·10⁶ div df), the
  // integer-exact idf-ratio stand-in (no log/libm), top-3 per doc.
  // Shared with their maintained twins (cdc42 / cdc43): the
  // fold == one-shot equality claim is only meaningful if both
  // queries pin against the IDENTICAL oracle text.
  private val prioritySampleOracle = """
      WITH t AS (
        SELECT doc_id,
          CAST(len(string_split(TRIM(text), ' ')) AS BIGINT) + 1 AS w,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
            1, 10)) AS BIGINT) AS u
        FROM documents)
      SELECT doc_id, w, u // w AS priority
      FROM t
      ORDER BY priority, doc_id
      LIMIT 64"""

  private val rarityKeywordsOracle = """
      WITH words AS (
        SELECT doc_id, w AS word FROM (
          SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS w
          FROM documents)
        WHERE length(w) > 0),
      tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM words GROUP BY doc_id, word),
      df AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY word),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      sc AS (
        SELECT t.doc_id, t.word, t.tf, d.df,
          t.tf * ((n.n_docs * 1000000) // d.df) AS score
        FROM tf t JOIN df d USING (word), n)
      SELECT doc_id, word, tf, df, score,
        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score DESC, word) AS BIGINT) AS rnk
      FROM sc
      QUALIFY rnk <= 3
      ORDER BY doc_id, rnk"""

  private val doc48 = GraftQuery(
    "doc48_priority_sample",
    (s, dir) =>
      CurationOps.prioritySample(t(s, dir, "documents"), k = 64)
        .orderBy(col("priority"), col("doc_id")),
    Some(prioritySampleOracle))

  private val doc49 = GraftQuery(
    "doc49_rarity_keywords",
    (s, dir) =>
      CurationOps.rarityKeywords(t(s, dir, "documents"), m = 3)
        .orderBy(col("doc_id"), col("rnk")),
    Some(rarityKeywordsOracle))

  // -------------------------------------------------------------- doc50
  // REPEATED-SPAN REMOVAL (DedupOps.removeRepeatedSpans) — the final
  // step of the Lee et al. exact-substring recipe: each document
  // rewritten with the doc47 islands cut out of its token stream
  // (the complement of the per-doc interval union). doc46 names the
  // deletion candidates, doc47 measures them, doc50 APPLIES them —
  // the operator that actually deduplicates the training text. The
  // oracle replays the islands-complement reconstruction in DuckDB
  // through list lambdas over the same 1-based token positions.
  private val spanRemovalOracle = """
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT doc_id, unnest(range(1, len(ws) - 8 + 2)) AS pos, ws
        FROM toks WHERE len(ws) >= 8),
      spk AS MATERIALIZED (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
          md5(array_to_string(ws[pos:pos+7], ' ')) AS span_key
        FROM sp),
      rep AS (
        SELECT span_key FROM spk GROUP BY span_key
        HAVING COUNT(DISTINCT doc_id) >= 2),
      occ AS MATERIALIZED (
        SELECT s.doc_id, s.pos FROM spk s JOIN rep r
        USING (span_key)),
      pe AS (
        SELECT doc_id, pos,
          MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_end
        FROM occ),
      fl AS (
        SELECT doc_id, pos,
          CASE WHEN prev_end IS NULL OR pos > prev_end
            THEN 1 ELSE 0 END AS flag
        FROM pe),
      grp AS (
        SELECT doc_id, pos,
          SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS g
        FROM fl),
      ext AS (
        SELECT doc_id, g, MIN(pos) AS s, MAX(pos) + 8 AS e
        FROM grp GROUP BY doc_id, g),
      ivs AS (
        SELECT doc_id, list({'s': s, 'e': e}) AS ivs
        FROM ext GROUP BY doc_id),
      base AS (
        SELECT t.doc_id, t.ws,
          COALESCE(i.ivs, []) AS ivs
        FROM toks t LEFT JOIN ivs i USING (doc_id)),
      kept AS (
        SELECT doc_id, ws,
          list_filter(range(1, len(ws) + 1),
            p -> len(list_filter(ivs,
              iv -> p >= iv.s AND p < iv.e)) = 0) AS kp
        FROM base)
      SELECT doc_id,
        COALESCE(array_to_string(
          list_transform(kp, p -> ws[p]), ' '), '') AS text_deduped,
        CAST(len(ws) - len(kp) AS BIGINT) AS n_tok_removed
      FROM kept
      ORDER BY doc_id"""

  private val doc50 = GraftQuery(
    "doc50_remove_spans",
    (s, dir) =>
      DedupOps.removeRepeatedSpans(t(s, dir, "documents"), spanLen = 8)
        .orderBy(col("doc_id")),
    Some(spanRemovalOracle))

  // -------------------------------------------------------------- cdc41
  // MAINTAINED SPAN-DEDUP VIEW (IncrementalSpans.removalView) — doc50
  // served from the maintained grid: the fold keeps the global
  // which-spans-repeat statistic current (append-shaped, cdc40), and
  // the view rewrites requested docs with every grid-repeated span
  // cut out. The case a per-batch one-shot gets WRONG is built into
  // the harness: batch 0's docs own spans that only become repeated
  // when batches 1-2 arrive — the view still cuts them, because the
  // grid remembers every owner. Requesting the full corpus must equal
  // the one-shot doc50 rewrite exactly (same oracle).
  // The harness COMPACTS mid-stream (after the replayed batch 1), so
  // the serve exercises the r14 ∝-repeated-mass path end to end: the
  // _rep summary (repeats as of batch 1), the residual generation
  // (batch 2), and the compacted-singleton reconciliation (spans
  // whose second owner arrives only in batch 2 — invisible to the
  // summary, recovered by the point-probe / semi-join fallback).
  private val cdc41 = GraftQuery(
    "cdc41_span_removal_view",
    (s, dir) => {
      import s.implicits._
      val table = "cdc41_spans"
      graft.streaming.IncrementalSpans.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalSpans.applyBatch(s, table,
          part(p), batchId = b)
      }
      graft.streaming.IncrementalSpans.compact(s, table)
      graft.streaming.IncrementalSpans.applyBatch(s, table,
        part(2), batchId = 2L)
      graft.streaming.IncrementalSpans.removalView(s, table, docs)
        .orderBy($"doc_id")
    },
    Some(spanRemovalOracle))

  // ---------------------------------------------------- doc39 / cdc33
  // Count-Min frequency sketch: d=4 seeded hash rows × w=256 BIGINT
  // counters over the corpus word stream; estimate = min over rows —
  // can only OVERCOUNT, ≤ truth + εN w.h.p. The frequency member of
  // the sketch family (q57 HLL distinct, q58 KMV set algebra); the
  // oracle replays the seeded hashes, the grid, the min-probe, the
  // ≥-truth guarantee and the 3N/256 band exactly. cdc33 is the same
  // report served from the INCREMENTALLY maintained grid — counters
  // are pure sums, so batched == one-shot bit-exactly.
  private val cmsOracle = """
      WITH wtok AS (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
      wf AS (SELECT word FROM wtok WHERE length(word) > 0),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wf),
      ex AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS tf_exact
        FROM wf GROUP BY word),
      cells AS (
        SELECT t.j,
          CAST(('0x' || substring(md5(CAST(t.j AS VARCHAR) || ':' ||
            word), 1, 10)) AS BIGINT) % 256 AS bucket
        FROM wf, range(0, 4) t(j)),
      grid AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY j, bucket),
      probes AS (
        SELECT e.word, t.j,
          CAST(('0x' || substring(md5(CAST(t.j AS VARCHAR) || ':' ||
            e.word), 1, 10)) AS BIGINT) % 256 AS bucket
        FROM ex e, range(0, 4) t(j)),
      est AS (
        SELECT p.word, MIN(COALESCE(g.cnt, 0)) AS tf_cms
        FROM probes p LEFT JOIN grid g
          ON g.j = p.j AND g.bucket = p.bucket
        GROUP BY p.word)
      SELECT e.word, e.tf_exact, CAST(est.tf_cms AS BIGINT) AS tf_cms,
        est.tf_cms >= e.tf_exact AS over_ok,
        (est.tf_cms - e.tf_exact) * 256 <= nt.n * 3 AS band_ok
      FROM ex e JOIN est USING (word), nt
      ORDER BY e.word"""

  private def cmsReport(words: DataFrame, grid: DataFrame): DataFrame = {
    val exact = words.groupBy("word")
      .agg(count(lit(1)).as("tf_exact"))
    val nTot = words.agg(count(lit(1)).as("n"))
    val est = SketchOps.cmsEstimate(grid, exact, "word")
    exact.join(est, exact("word") === est("item"))
      .join(broadcast(nTot))
      .select(exact("word"), col("tf_exact"), col("est").as("tf_cms"),
        (col("est") >= col("tf_exact")).as("over_ok"),
        ((col("est") - col("tf_exact")) * 256 <= col("n") * 3)
          .as("band_ok"))
      .orderBy(col("word"))
  }

  private def corpusWords(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.TextFunctions
        .tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)

  private val doc39 = GraftQuery(
    "doc39_cms_counts",
    (s, dir) => {
      val words = corpusWords(t(s, dir, "documents"))
      cmsReport(words, SketchOps.cmsGrid(words, "word"))
    },
    Some(cmsOracle))

  private val cdc33 = GraftQuery(
    "cdc33_incremental_cms",
    (s, dir) => {
      import s.implicits._
      val table = "cdc33_grid"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) =
        corpusWords(docs.filter(pmod($"doc_id", lit(3)) === i))
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalCms.applyBatch(s, table, part(p),
          "word", id)
      }
      cmsReport(corpusWords(docs),
        graft.streaming.IncrementalCms.readGrid(s, table))
    },
    Some(cmsOracle))

  // -------------------------------------------------------------- cdc34
  // Incrementally-maintained funnel (IncrementalFunnel): q60's
  // order-dependent per-user state folded over three TIME-ORDERED
  // date-sliced batches plus a REDELIVERED batch — the first
  // non-commutative member of the maintained-state family, exact
  // under the watermark-ordered ingest contract. The served report
  // must equal one-shot q60 row for row — q60's own oracle is the
  // gate.
  private val cdc34 = GraftQuery(
    "cdc34_incremental_funnel",
    (s, dir) => {
      import s.implicits._
      val steps = Seq("view", "click", "purchase")
      val table = "cdc34_funnel"
      graft.streaming.IncrementalFunnel.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events")
      // time-ordered slices (the contract): Jan 1-10, 11-20, 21-31
      def slice(lo: String, hi: String) =
        ev.filter($"ts" >= lit(lo).cast("timestamp") &&
          $"ts" < lit(hi).cast("timestamp"))
      val batches = Seq(
        slice("2024-01-01", "2024-01-11"),
        slice("2024-01-11", "2024-01-21"),
        slice("2024-01-21", "2024-02-01"))
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends slice 1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalFunnel.applyBatch(s, table,
          batches(p), steps, id)
      }
      graft.streaming.IncrementalFunnel.funnelReport(s, table, steps)
        .orderBy($"step")
    },
    q60.oracle)

  // -------------------------------------------------------------- mm07
  // Video-style frame-fingerprint near-dup: fixed 16-byte frame
  // slices (the stub frame raster), 40-bit fingerprints, doc36's
  // inverted-index equi-join at frame grain with the absolute df cap
  // — media sharing >= 3 distinct frames match (re-cut/re-encoded
  // content that whole-payload pHash misses). Oracle replays slicing,
  // hashing, the cap and the overlap count exactly.
  private val mm07 = GraftQuery(
    "mm07_frame_neardup",
    (s, dir) =>
      MultimodalOps.frameNearDups(
          MultimodalOps.toMediaColumns(t(s, dir, "documents")))
        .orderBy(col("doc_a"), col("doc_b")),
    Some(frameNearDupOracle))

  // Shared by mm07 and its maintained twin cdc58 (one oracle text,
  // two pinned surfaces).
  private def frameNearDupOracle: String = ("""
      WITH fr AS (
        SELECT doc_id, substring(text, 1 + i * 16, 16) AS f
        FROM documents, range(0, 16) t(i)
        WHERE length(text) >= (i + 1) * 16),
      fps AS (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substring(md5(f), 1, 10)) AS BIGINT) AS fprint
        FROM fr),
      dfc AS (
        SELECT fprint, COUNT(*) AS c FROM fps GROUP BY fprint),
      kept AS (
        SELECT fps.doc_id, fps.fprint
        FROM fps JOIN dfc USING (fprint) WHERE dfc.c <= 100),
      p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(COUNT(*) AS BIGINT) AS n_match
        FROM kept a JOIN kept b
          ON a.fprint = b.fprint AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_match FROM p
      WHERE n_match >= 3
      ORDER BY doc_a, doc_b""")

  // -------------------------------------------------------------- emb29
  // Approximate k-NN graph: every vector's top-4 cosine neighbors
  // via emb05's multi-probe shape with EVERY vector as a query —
  // candidates are the members of each vector's 2 nearest cells (cid
  // equi-join, never n²). The seed structure for NN-descent / graph
  // ANN / neighborhood dedup. Oracle replays assignment, probing,
  // the distinct candidate set and the ranking on the emb01
  // fixed-association cosine chains.
  private def knnGraphCtes(nProbe: Int): String = s"""
      cent AS (
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
              DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      members AS (
        SELECT cid, vec_id AS nbr_id, embedding AS m_emb, en AS m_en
        FROM assign WHERE rn = 1),
      probes AS (
        SELECT vec_id, embedding, en, cid FROM assign
        WHERE rn <= $nProbe),
      cand AS (
        SELECT DISTINCT p.vec_id, m.nbr_id,
          (${dotSql("p.embedding", "m.m_emb", 64)}) / (p.en * m.m_en)
            AS cos
        FROM probes p JOIN members m
          ON p.cid = m.cid AND p.vec_id <> m.nbr_id),
      g AS (
        SELECT vec_id, nbr_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
        FROM cand)"""

  private val emb29 = GraftQuery(
    "emb29_knn_graph",
    (s, dir) =>
      SimilarityOps.knnGraph(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("nbr_id"), col("rnk"), col("cos"))
        .orderBy(col("vec_id"), col("rnk")),
    Some(s"""
      WITH ${knnGraphCtes(nProbe = 2)}
      SELECT vec_id, nbr_id, rnk, cos FROM g
      WHERE rnk <= 4
      ORDER BY vec_id, rnk"""))

  // -------------------------------------------------------------- emb30
  // One NN-descent refinement step from the deterministic RANDOM
  // seed (arithmetic ring graph — the recipe's content-blind initial
  // graph; a cell-local seed is structurally a no-op, see
  // ringSeedGraph): candidates = undirected neighborhood + one-hop
  // expansion, exact cosine re-rank, top-k — the Dong et al.
  // convergence engine as two k-bounded edge-list equi-joins, no
  // driver loop. The spec pins the measured recall gain and the
  // monotone-improvement property; the oracle replays seed, reversal,
  // hop-2 and the re-rank.
  private val emb30 = GraftQuery(
    "emb30_nn_descent",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val seed = SimilarityOps.ringSeedGraph(embs)
      SimilarityOps.nnDescentStep(embs, seed)
        .select(col("vec_id"), col("nbr_id"), col("rnk"), col("cos"))
        .orderBy(col("vec_id"), col("rnk"))
    },
    Some(s"""
      WITH base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      nn AS (SELECT COUNT(*) AS n FROM embeddings),
      seed AS (
        SELECT e.vec_id, (e.vec_id + j.j * 37) % nn.n AS nbr_id
        FROM embeddings e, range(1, 5) j(j), nn),
      und AS (
        SELECT vec_id, nbr_id FROM seed
        UNION
        SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM seed),
      hop2 AS (
        SELECT a.vec_id, b.nbr_id AS cand
        FROM und a JOIN und b ON a.nbr_id = b.vec_id),
      cand2 AS (
        SELECT DISTINCT vec_id, cand FROM (
          SELECT vec_id, nbr_id AS cand FROM und
          UNION ALL SELECT vec_id, cand FROM hop2)
        WHERE vec_id <> cand),
      rr AS (
        SELECT c.vec_id, c.cand AS nbr_id,
          (${dotSql("p.embedding", "q.embedding", 64)}) / (p.en * q.en)
            AS cos
        FROM cand2 c
        JOIN base p ON p.vec_id = c.vec_id
        JOIN base q ON q.vec_id = c.cand),
      rk AS (
        SELECT vec_id, nbr_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
        FROM rr)
      SELECT vec_id, nbr_id, rnk, cos FROM rk
      WHERE rnk <= 4
      ORDER BY vec_id, rnk"""))

  // -------------------------------------------------------------- emb31
  // NN-descent CONVERGENCE LOOP (SimilarityOps.nnDescent): emb30 is
  // one refinement step; this pins the iterated service — ring seed,
  // TWO unrolled rounds (minGainPpm = -1 disables the data-dependent
  // early stop, so the round count is exact — SQL cannot replay a
  // convergence test, and the loop's gain scalar is a driver-side
  // control read anyway). The oracle nests the emb30 step CTEs twice;
  // LlmOpsSpec carries the convergence acceptance (recall@k vs brute
  // force monotone per round, ≥ target at the fixed point).
  private def nnStepCtes(inG: String, outG: String, i: Int): String = s"""
      und$i AS (
        SELECT vec_id, nbr_id FROM $inG
        UNION
        SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM $inG),
      hop$i AS (
        SELECT a.vec_id, b.nbr_id AS cand
        FROM und$i a JOIN und$i b ON a.nbr_id = b.vec_id),
      cnd$i AS (
        SELECT DISTINCT vec_id, cand FROM (
          SELECT vec_id, nbr_id AS cand FROM und$i
          UNION ALL SELECT vec_id, cand FROM hop$i)
        WHERE vec_id <> cand),
      rr$i AS (
        SELECT c.vec_id, c.cand AS nbr_id,
          (${dotSql("p.embedding", "q.embedding", 64)}) / (p.en * q.en)
            AS cos
        FROM cnd$i c
        JOIN base p ON p.vec_id = c.vec_id
        JOIN base q ON q.vec_id = c.cand),
      $outG AS (
        SELECT vec_id, nbr_id, cos, rnk FROM (
          SELECT vec_id, nbr_id, cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
          FROM rr$i)
        WHERE rnk <= 4)"""

  private val emb31 = GraftQuery(
    "emb31_nn_descent_loop",
    (s, dir) =>
      SimilarityOps.nnDescent(t(s, dir, "embeddings"),
          maxRounds = 2, minGainPpm = -1L)
        .select(col("vec_id"), col("nbr_id"), col("rnk"), col("cos"))
        .orderBy(col("vec_id"), col("rnk")),
    Some(s"""
      WITH base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      nn AS (SELECT COUNT(*) AS n FROM embeddings),
      seed AS (
        SELECT e.vec_id, (e.vec_id + j.j * 37) % nn.n AS nbr_id
        FROM embeddings e, range(1, 5) j(j), nn),
      ${nnStepCtes("seed", "g1", 1)},
      ${nnStepCtes("g1", "g2", 2)}
      SELECT vec_id, nbr_id, rnk, cos FROM g2
      ORDER BY vec_id, rnk"""))

  // ------------------------------------------------------ emb32/emb33
  // The SKEW GUARD of the cell-quadratic operators, oracle-pinned:
  // emb29/emb27 bound per-cell pairwise work at |cell|² only if no
  // cell runs hot — real embedding corpora cluster heavily, so the
  // 100 TB path needs membership CAPPED. These two queries run the
  // SAME operators with capacity = ceil(n/nCells) (maximal pressure:
  // every displacement cascade actually runs) — membership via
  // emb25's strict deferred acceptance, replayed in the oracle as the
  // same recursive CTE, then the emb29/emb27 logic verbatim on the
  // capped members. Green here = the capped path is not a separate
  // code fork but the same operators with the guard engaged.
  /** Deferred-acceptance (strict capacity-bounded) assignment CTEs —
    * `cent`/`base`/`cap`/`sim`/`assign`/`st`/`fin`/`members`.
    * `centSql` overrides the centroid CTE body (default: first-k
    * corpus vectors); `capSql` overrides the capacity expression
    * evaluated over `base` (default: minimal ceil(n/nCells)). Both
    * let emb34 replay the pipeline against TRAINED centroids. */
  private def strictMembersCtes(nCells: Int, centSql: String = "",
      capSql: String = ""): String = {
    val cent = if (centSql.nonEmpty) centSql else s"""
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < $nCells"""
    val cap = if (capSql.nonEmpty) capSql
      else s"CAST((COUNT(*) + ${nCells - 1}) // $nCells AS BIGINT)"
    s"""
      cent AS ($cent),""" + strictTailCtes(cap)
  }

  private def strictTailCtes(capSql: String): String = s"""
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      cap AS (SELECT $capSql AS c FROM base),
      sim AS (
        SELECT b.vec_id, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
            AS ccos
        FROM base b CROSS JOIN cent c),
      assign AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY ccos DESC, cid) AS rn
        FROM sim),
      st AS (
        SELECT 0 AS it, vec_id, 1 AS rnk FROM base
        UNION ALL
        SELECT nxt.it, nxt.vec_id, nxt.rnk FROM (
          SELECT cur.it + 1 AS it, cur.vec_id,
            CASE WHEN cur.prio > (SELECT c FROM cap)
              THEN cur.rnk + 1 ELSE cur.rnk END AS rnk,
            SUM(CASE WHEN cur.prio > (SELECT c FROM cap)
              THEN 1 ELSE 0 END) OVER () AS n_adv
          FROM (
            SELECT s.it, s.vec_id, s.rnk, a.cid, a.ccos,
              ROW_NUMBER() OVER (PARTITION BY a.cid
                ORDER BY a.ccos DESC, s.vec_id) AS prio
            FROM st s JOIN assign a
              ON a.vec_id = s.vec_id AND a.rn = s.rnk
          ) cur
        ) nxt WHERE nxt.n_adv > 0),
      fin AS (
        SELECT vec_id, rnk FROM st
        WHERE it = (SELECT MAX(it) FROM st)),
      members AS (
        SELECT a.cid, f.vec_id, b.embedding, b.en, a.ccos
        FROM fin f
        JOIN assign a ON a.vec_id = f.vec_id AND a.rn = f.rnk
        JOIN base b ON b.vec_id = f.vec_id)"""

  private val emb32 = GraftQuery(
    "emb32_knn_graph_capped",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val n = embs.count()
      SimilarityOps.knnGraph(embs, capacity = Some((n + 7) / 8))
        .select(col("vec_id"), col("nbr_id"), col("rnk"), col("cos"))
        .orderBy(col("vec_id"), col("rnk"))
    },
    Some(s"""
      WITH RECURSIVE ${strictMembersCtes(nCells = 8)},
      probes AS (
        SELECT a.vec_id, b.embedding, b.en, a.cid
        FROM assign a JOIN base b ON b.vec_id = a.vec_id
        WHERE a.rn <= 2),
      cand AS (
        SELECT DISTINCT p.vec_id, m.vec_id AS nbr_id,
          (${dotSql("p.embedding", "m.embedding", 64)})
            / (p.en * m.en) AS cos
        FROM probes p JOIN members m
          ON p.cid = m.cid AND p.vec_id <> m.vec_id),
      g AS (
        SELECT vec_id, nbr_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk
        FROM cand)
      SELECT vec_id, nbr_id, rnk, cos FROM g
      WHERE rnk <= 4
      ORDER BY vec_id, rnk"""))

  private val emb33 = GraftQuery(
    "emb33_semdedup_capped",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val n = embs.count()
      SimilarityOps.semanticDedup(embs, capacity = Some((n + 7) / 8))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH RECURSIVE ${strictMembersCtes(nCells = 8)},
      ranked AS (
        SELECT vec_id, embedding, en, cid, ccos,
          CAST(ROW_NUMBER() OVER (PARTITION BY cid
            ORDER BY ccos DESC, vec_id) AS BIGINT) AS crnk
        FROM members),
      best AS (
        SELECT a.cid, a.vec_id,
          MAX(CAST(FLOOR(
            (${dotSql("a.embedding", "b.embedding", 64)})
              / (a.en * b.en) * 1000000 ) AS BIGINT)) AS bp
        FROM ranked a JOIN ranked b
          ON b.cid = a.cid AND b.crnk < a.crnk
        GROUP BY a.cid, a.vec_id)
      SELECT r.vec_id, r.cid, r.crnk,
        COALESCE(bp, -1000000) AS best_better_ppm,
        COALESCE(bp, -1000000) >= 350000 AS is_dup
      FROM ranked r LEFT JOIN best
        ON best.cid = r.cid AND best.vec_id = r.vec_id
      ORDER BY r.vec_id"""))

  // ---------------------------------------------------- doc42 / cdc35
  // Bloom membership filter — the MEMBERSHIP member of the sketch
  // family (q57 HLL, q58 KMV, doc39 CMS): d=3 seeded hashes into
  // m=1024 bits over the EVAL vocabulary (the doc13 decontamination
  // gate, doc_id % 97), probed by the full corpus vocabulary. The
  // no-false-negative guarantee is pinned per word (fn_ok), and the
  // false positives themselves hash-match because both engines
  // replay the same seeded bits. cdc35 serves the same report from
  // the INCREMENTALLY maintained bit table — set union is
  // associative/commutative/idempotent, so batched == one-shot
  // bit-exactly (the cdc30 HLL argument, at membership grain).
  private val bloomOracle = s"""
      WITH ${LlmQueries.bigramShCtes},
      vocab AS (SELECT DISTINCT shingle FROM sh),
      mem AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      bits AS (
        SELECT DISTINCT CAST(('0x' || substring(md5(
            CAST(t.j AS VARCHAR) || ':' || shingle), 1, 10))
          AS BIGINT) % 1024 AS bit
        FROM mem, range(0, 3) t(j)),
      probes AS (
        SELECT v.shingle, t.j,
          CAST(('0x' || substring(md5(
              CAST(t.j AS VARCHAR) || ':' || v.shingle), 1, 10))
            AS BIGINT) % 1024 AS bit
        FROM vocab v, range(0, 3) t(j)),
      mc AS (
        SELECT p.shingle, COUNT(b.bit) = 3 AS might_contain
        FROM probes p LEFT JOIN bits b ON b.bit = p.bit
        GROUP BY p.shingle)
      SELECT v.shingle, m.shingle IS NOT NULL AS is_member,
        mc.might_contain,
        (m.shingle IS NULL OR mc.might_contain) AS fn_ok
      FROM vocab v
      LEFT JOIN mem m ON m.shingle = v.shingle
      JOIN mc ON mc.shingle = v.shingle
      ORDER BY v.shingle"""

  private def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions
        .bigramShingles(col("text"))).as("shingle"))

  private def bloomReport(docs: DataFrame, bits: DataFrame)
      : DataFrame = {
    val sh = docShingles(docs)
    val vocab = sh.select("shingle").distinct()
    val mem = sh.filter(col("doc_id") % 97 === 0)
      .select("shingle").distinct()
    val mc = SketchOps.bloomMightContain(bits, vocab, "shingle")
    vocab
      .join(mem.withColumn("_m", lit(1L)), Seq("shingle"),
        "left_outer")
      .select(col("shingle"), col("_m").isNotNull.as("is_member"))
      .join(mc, col("shingle") === mc("item"))
      .select(col("shingle"), col("is_member"), col("might_contain"),
        (!col("is_member") || col("might_contain")).as("fn_ok"))
      .orderBy(col("shingle"))
  }

  private val doc42 = GraftQuery(
    "doc42_bloom_membership",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val mem = docShingles(docs.filter(col("doc_id") % 97 === 0))
      bloomReport(docs, SketchOps.bloomBits(mem, "shingle"))
    },
    Some(bloomOracle))

  private val cdc35 = GraftQuery(
    "cdc35_incremental_bloom",
    (s, dir) => {
      import s.implicits._
      val table = "cdc35_bits"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docShingles(
        docs.filter($"doc_id" % 97 === 0 && pmod($"doc_id", lit(3)) === i))
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalBloom.applyBatch(s, table, part(p),
          "shingle", id)
      }
      bloomReport(docs,
        graft.streaming.IncrementalBloom.readBits(s, table))
    },
    Some(bloomOracle))

  // -------------------------------------------------------------- emb34
  // The IVF BUILD PIPELINE'S trainable half, oracle-pinned end to
  // end: k-means‖ seeding (emb23's gate arithmetic, verbatim) → the
  // top-8 coverage reduction → ONE Lloyd update on the fixed-point
  // grid (emb09's integer sums, here carried through the float32
  // centroid reconstitution both engines round identically: exact
  // BIGINT sums → identical double divides → identical
  // round-to-nearest-even REAL cast) → strict deferred-acceptance
  // assignment against the TRAINED centroids at the build's
  // ceil(1.3·n/8) capacity. This is IvfBuild.trainCentroids +
  // balancedAssignStrictTo composed — what build() writes as the
  // serving table, minus the table write SQL cannot observe.
  /** The 64 fixed-point-mean centroid components of
    * [[CurationOps.updateCentroids]] in SQL — BIGINT sums → double
    * divide → RTNE REAL cast, bit-exact cross-engine (shared by
    * emb34's Lloyd update and emb36's per-label centroids). */
  private def fpMeanComps(alias: String): String =
    (1 to 64).map(d =>
      s"""CAST((CAST(SUM(CAST(FLOOR(CAST($alias.embedding[$d] AS DOUBLE)
         | * 1000000.0) AS BIGINT)) AS DOUBLE)
         | / CAST(COUNT(*) AS DOUBLE)) / 1000000.0 AS REAL)"""
        .stripMargin.replaceAll("\n", ""))
      .mkString(",\n          ")

  private def ivfTrainCtes: String = {
    val r = 4; val l = 16; val k = 8
    val gate = l.toLong * (1L << 40)
    val rounds = (1 to r).map { i =>
      val prev = s"kc${i - 1}"
      s"""ka$i AS (
        SELECT b.vec_id,
          MAX((${dotSql("b.embedding", "c.embedding", 64)})
            / (b.n * c.n)) AS mx
        FROM bset b CROSS JOIN (
          SELECT bb.embedding, bb.n FROM bset bb
          JOIN $prev cd ON bb.vec_id = cd.vec_id) c
        GROUP BY b.vec_id),
      kd$i AS (
        SELECT vec_id,
          CAST(floor((1.0 - mx) * (1.0 - mx) * 1000000000.0)
            AS BIGINT) AS d2i
        FROM ka$i),
      kp$i AS (SELECT SUM(d2i) AS phi FROM kd$i),
      kc$i AS (
        SELECT vec_id FROM $prev
        UNION
        SELECT d.vec_id FROM kd$i d, kp$i
        WHERE CAST(CAST(('0x' ||
            substring(md5(CAST(d.vec_id AS VARCHAR) || ':$i'), 1, 10))
            AS BIGINT) AS HUGEINT) * kp$i.phi
          < CAST(d.d2i AS HUGEINT) * $gate)"""
    }.mkString(",\n      ")
    val comps = fpMeanComps("a")
    s"""bset AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS n
        FROM embeddings),
      kc0 AS (SELECT vec_id FROM bset ORDER BY vec_id LIMIT 1),
      $rounds,
      kcemb AS (
        SELECT bb.vec_id AS cid, bb.embedding AS ce, bb.n AS cn
        FROM bset bb JOIN kc$r cd ON bb.vec_id = cd.vec_id),
      ksim AS (
        SELECT b.vec_id, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.n * c.cn)
            AS ccos
        FROM bset b CROSS JOIN kcemb c),
      kasg AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY ccos DESC, cid) AS rn FROM ksim),
      kw AS (
        SELECT cid FROM (
          SELECT cid, COUNT(*) AS w FROM kasg WHERE rn = 1
          GROUP BY cid ORDER BY w DESC, cid LIMIT $k)),
      seedc AS (
        SELECT bb.vec_id AS cid, bb.embedding AS ce, bb.n AS cn
        FROM bset bb JOIN kw ON bb.vec_id = kw.cid),
      lsim AS (
        SELECT b.vec_id, b.embedding, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.n * c.cn)
              DESC, c.cid) AS rn
        FROM bset b CROSS JOIN seedc c),
      upd AS (
        SELECT cid, list_value(
          $comps) AS ce
        FROM lsim a WHERE rn = 1 GROUP BY cid)"""
  }

  // -------------------------------------------------------------- doc40
  // BPE merge-table training (CurationOps.bpeTrain), FOUR unrolled
  // rounds: the oracle carries each round's vocabulary as a
  // SELF-DELIMITED token encoding (chr(2)·tok·chr(3) per symbol) so
  // one `replace` applies the winning merge with exactly BPE's
  // greedy left-to-right non-overlap semantics — adjacent matches
  // share no characters, and "aaa" under (a,a) becomes "aa","a" on
  // both engines. Ties break (count DESC, l, r) in binary UTF-8
  // order on both engines; counts are BIGINT-exact.
  private def bpeRoundCtes(i: Int): String = {
    val prev = s"e${i - 1}"
    s"""t$i AS (
        SELECT tf, string_split(substring(enc, 2, length(enc) - 2),
          chr(3) || chr(2)) AS syms
        FROM $prev),
      p$i AS (
        SELECT l, r, CAST(SUM(tf) AS BIGINT) AS cnt FROM (
          SELECT tf,
            UNNEST(list_slice(syms, 1, len(syms) - 1)) AS l,
            UNNEST(list_slice(syms, 2, len(syms))) AS r
          FROM t$i WHERE len(syms) >= 2) q
        GROUP BY l, r),
      b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r
        LIMIT 1),
      e$i AS (
        SELECT word, tf, replace(enc,
          chr(2) || b.l || chr(3) || chr(2) || b.r || chr(3),
          chr(2) || b.l || b.r || chr(3)) AS enc
        FROM $prev, b$i b)"""
  }

  /** Shared BPE oracle chain: vocabulary → self-delimited encoding →
    * four unrolled merge rounds (`b1`..`b4` = the merge table, `e4` =
    * the fully-encoded vocabulary). doc40 reads the table; doc41
    * reads the encoding. */
  private def bpeCtes: String = s"""
      w AS (
        SELECT UNNEST(string_split(text, ' ')) AS word
        FROM documents),
      v AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS tf FROM w
        WHERE length(word) > 0 GROUP BY word),
      e0 AS (
        SELECT word, tf, chr(2) || array_to_string(
          string_split(word, ''), chr(3) || chr(2)) || chr(3) AS enc
        FROM v),
      ${(1 to 4).map(bpeRoundCtes).mkString(",\n      ")}"""

  private val doc40 = GraftQuery(
    "doc40_bpe_merges",
    (s, dir) =>
      CurationOps.bpeTrain(t(s, dir, "documents"), nMerges = 4)
        .orderBy(col("merge_rank")),
    Some(s"""
      WITH $bpeCtes
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS merge_rank, l AS lhs, r AS rhs,
          cnt AS pair_count FROM b1
        UNION ALL SELECT 2, l, r, cnt FROM b2
        UNION ALL SELECT 3, l, r, cnt FROM b3
        UNION ALL SELECT 4, l, r, cnt FROM b4)
      ORDER BY merge_rank"""))

  // -------------------------------------------------------------- doc41
  // BPE ENCODE with the trained table (CurationOps.bpeEncode): the
  // tokenizer applied back to the corpus — per-document token counts
  // under the learned merges, the sizing statistic sequence packing
  // (doc12) consumes. Scale-honest: merges apply to the VOCABULARY
  // (corpus-sublinear), the corpus only equi-joins word occurrences
  // to the encoded vocab. The oracle reuses the training chain's e4
  // (fully-encoded vocabulary) — training and encoding MUST agree on
  // the merge semantics, and sharing the CTEs pins exactly that.
  private val doc41 = GraftQuery(
    "doc41_bpe_encode",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      CurationOps.bpeEncode(docs,
          CurationOps.bpeTrain(docs, nMerges = 4))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $bpeCtes,
      tc AS (
        SELECT word, CAST(len(string_split(
          substring(enc, 2, length(enc) - 2), chr(3) || chr(2)))
          AS BIGINT) AS n_toks
        FROM e4),
      occ AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        FROM documents)
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(tc.n_toks) AS BIGINT) AS n_tokens
      FROM occ o JOIN tc ON o.word = tc.word
      WHERE length(o.word) > 0
      GROUP BY o.doc_id
      ORDER BY o.doc_id"""))

  private val emb34 = GraftQuery(
    "emb34_ivf_pipeline",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val n = embs.count()
      val cents = graft.streaming.IvfBuild.trainCentroids(embs,
        nlist = 8, seedRounds = 4, oversample = 16, lloydIters = 2)
      SimilarityOps.balancedAssignStrictTo(embs, cents,
          capacity = (13 * n + 79) / 80, nCentroidsHint = Some(8))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH RECURSIVE $ivfTrainCtes,
      ${strictMembersCtes(8,
        centSql = s"""SELECT cid, ce, ${normSql("ce", 64)} AS cn
          FROM upd""",
        capSql = "CAST((13 * COUNT(*) + 79) // 80 AS BIGINT)")}
      SELECT f.vec_id, a.cid, CAST(f.rnk AS BIGINT) AS rank
      FROM fin f JOIN assign a
        ON a.vec_id = f.vec_id AND a.rn = f.rnk
      ORDER BY f.vec_id"""))

  // -------------------------------------------------------------- emb35
  // kNN LABEL PROPAGATION (SimilarityOps.knnClassify) — auto-labeling
  // at corpus scale: the 20% of vectors gated "unlabeled"
  // (vec_id % 5 = 0) receive the majority label of their 5 nearest
  // LABELED neighbors through the emb29 cell-bounded candidate shape
  // (probes rank nProbe=2 cells, members are labeled rank-1
  // occupants, cid equi-join — never n²). The oracle replays
  // assignment, probing, top-k and the vote with its deterministic
  // tie chain (count DESC, label; cos DESC, nbr_id). correct grades
  // the propagation against the held-back truth per row.
  private val emb35 = GraftQuery(
    "emb35_knn_classify",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      SimilarityOps.knnClassify(embs,
          labeledFilter = col("vec_id") % 5 =!= 0)
        .join(embs.select(col("vec_id"),
          col("label").cast("long").as("true_label")), Seq("vec_id"))
        .select(col("vec_id"), col("true_label"), col("pred_label"),
          col("n_votes"),
          (col("pred_label") === col("true_label")).as("correct"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, label,
          ${normSql("embedding", 64)} AS en
        FROM embeddings),
      sim AS (
        SELECT b.vec_id, b.embedding, b.en, b.label, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
            AS ccos
        FROM base b CROSS JOIN cent c),
      asg AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY ccos DESC, cid) AS rn
        FROM sim),
      members AS (
        SELECT cid, vec_id AS nbr_id, embedding AS m_emb,
          en AS m_en, label
        FROM asg WHERE rn = 1 AND vec_id % 5 <> 0),
      probes AS (
        SELECT vec_id, embedding, en, cid
        FROM asg WHERE rn <= 2 AND vec_id % 5 = 0),
      cand AS (
        SELECT p.vec_id, m.nbr_id, m.label,
          (${dotSql("p.embedding", "m.m_emb", 64)})
            / (p.en * m.m_en) AS cos
        FROM probes p JOIN members m ON m.cid = p.cid),
      topk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, nbr_id) AS rnk
        FROM cand),
      votes AS (
        SELECT vec_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM topk WHERE rnk <= 5 GROUP BY vec_id, label),
      win AS (
        SELECT vec_id, CAST(label AS BIGINT) AS pred_label, n_votes,
          ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY n_votes DESC, label) AS vr
        FROM votes)
      SELECT w.vec_id, CAST(e.label AS BIGINT) AS true_label,
        w.pred_label, w.n_votes,
        w.pred_label = CAST(e.label AS BIGINT) AS correct
      FROM win w JOIN embeddings e ON e.vec_id = w.vec_id
      WHERE w.vr = 1
      ORDER BY w.vec_id"""))

  // -------------------------------------------------------------- emb36
  // LABEL-MARGIN AUDIT (CurationOps.labelMarginAudit) — noisy-label
  // detection: one fixed-point centroid PER LABEL (the emb34 float32
  // reconstitution, bit-exact cross-engine), every labeled vector
  // scored by own-centroid cosine minus best-rival cosine, shipped
  // as truncating integer ppm. Negative margin = the relabel/review
  // shortlist a training run wants before trusting labels.
  private val emb36 = GraftQuery(
    "emb36_label_margin",
    (s, dir) =>
      CurationOps.labelMarginAudit(t(s, dir, "embeddings"))
        .orderBy(col("vec_id")),
    Some(s"""
      WITH cent AS (
        SELECT CAST(a.label AS BIGINT) AS cid, list_value(
          ${fpMeanComps("a")}) AS ce
        FROM embeddings a GROUP BY a.label),
      centn AS (
        SELECT cid, ce, ${normSql("ce", 64)} AS cn FROM cent),
      base AS (
        SELECT vec_id, embedding, CAST(label AS BIGINT) AS label,
          ${normSql("embedding", 64)} AS en
        FROM embeddings),
      sim AS (
        SELECT b.vec_id, b.label, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
            AS ccos
        FROM base b CROSS JOIN centn c),
      own AS (
        SELECT vec_id, label, ccos AS own_cos
        FROM sim WHERE cid = label),
      riv AS (
        SELECT vec_id, cid AS rival_label, ccos AS rival_cos,
          ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY ccos DESC, cid) AS orn
        FROM sim WHERE cid <> label)
      SELECT o.vec_id, o.label, r.rival_label,
        CAST(FLOOR((o.own_cos - r.rival_cos) * 1000000) AS BIGINT)
          AS margin_ppm,
        FLOOR((o.own_cos - r.rival_cos) * 1000000) < 0 AS suspect
      FROM own o JOIN riv r ON r.vec_id = o.vec_id AND r.orn = 1
      ORDER BY o.vec_id"""))

  // -------------------------------------------------------------- emb37
  // PAGERANK over the emb29 kNN graph (GraphOps.pageRank) —
  // representativeness-aware selection: rank each vector by how much
  // of the corpus points AT it through nearest-neighbor edges, the
  // graph-native complement of DSIR importance (doc30). Mass is
  // BIGINT fixed-point (10¹² parts) with truncating per-edge
  // divisions, so the sums associate and DuckDB replays the
  // identical arithmetic — three unrolled sparse mat-vec rounds,
  // each one edges⋈rank equi-join + one map-side-combined sum.
  private def pageRankIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""c$i AS (
        SELECT e.dst AS vid, CAST(SUM(p.pr // e.deg_out) AS BIGINT) AS s
        FROM ed e JOIN $prev p ON p.vid = e.src
        GROUP BY e.dst),
      pr$i AS MATERIALIZED (
        SELECT b.vid, b.tele + (85 * COALESCE(c.s, 0)) // 100 AS pr
        FROM prb b LEFT JOIN c$i c ON c.vid = b.vid)"""
    }.mkString(",\n      ")

  // Shared with the maintained twin (cdc49): one oracle text, two
  // pinned surfaces (the bm25Oracle doctrine). A def — emb37 captures
  // it during object init.
  private def pageRankOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS MATERIALIZED (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      verts AS (SELECT vec_id AS vid FROM embeddings),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),
      outdeg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg_out
        FROM edges GROUP BY src),
      prb AS MATERIALIZED (
        SELECT v.vid,
          ((1000000000000 * 15) // 100) // nn.n AS tele,
          1000000000000 // nn.n AS p0
        FROM verts v, nn),
      ed AS MATERIALIZED (
        SELECT e.src, e.dst, o.deg_out
        FROM edges e JOIN outdeg o ON o.src = e.src),
      pr0 AS (SELECT vid, p0 AS pr FROM prb),
      ${pageRankIterCtes(3)}
      SELECT p.vid, COALESCE(o.deg_out, 0) AS deg_out, p.pr
      FROM pr3 p LEFT JOIN outdeg o ON o.src = p.vid
      ORDER BY p.vid"""

  private val emb37 = GraftQuery(
    "emb37_graph_pagerank",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.pageRank(edges,
          embs.select(col("vec_id").as("vid")), iters = 3)
        .orderBy(col("vid"))
    },
    Some(pageRankOracle))

  // -------------------------------------------------------------- emb38
  // TRIANGLE COUNT + clustering coefficient over the emb29 kNN graph
  // (GraphOps.triangles) — the local-density audit: high cc = the
  // vector sits in a tight near-dup clump (dedup harder there), low
  // cc at high degree = a hub bridging unrelated regions. Edges are
  // symmetrized and DEGREE-ORIENTED (toward the higher (deg, id)
  // endpoint) so wedge volume is O(m^{3/2}) on any degree
  // distribution — the hub-safe plan at corpus scale; every join is
  // an equi-join. cc is truncating integer ppm.
  private def triangleOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
      deg AS MATERIALIZED (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS vid FROM und
              UNION ALL SELECT v AS vid FROM und)
        GROUP BY vid),
      ore AS MATERIALIZED (
        SELECT
          CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
            THEN u ELSE v END AS a,
          CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
            THEN v ELSE u END AS b
        FROM und
        JOIN deg d1 ON d1.vid = u
        JOIN deg d2 ON d2.vid = v),
      ob AS MATERIALIZED (
        SELECT o.a, o.b, d.deg AS db
        FROM ore o JOIN deg d ON d.vid = o.b),
      wedges AS MATERIALIZED (
        SELECT w1.a, w1.b, w2.b AS c
        FROM ob w1 JOIN ob w2 ON w1.a = w2.a
        WHERE w1.db < w2.db OR (w1.db = w2.db AND w1.b < w2.b)),
      tris AS (
        SELECT w.a, w.b, w.c
        FROM wedges w JOIN ore o ON o.a = w.b AND o.b = w.c),
      pv AS (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM (SELECT a AS vid FROM tris
              UNION ALL SELECT b AS vid FROM tris
              UNION ALL SELECT c AS vid FROM tris)
        GROUP BY vid)
      SELECT d.vid, d.deg, COALESCE(pv.n_tri, 0) AS n_tri,
        CASE WHEN d.deg >= 2
          THEN (2000000 * COALESCE(pv.n_tri, 0))
            // (d.deg * (d.deg - 1))
          ELSE 0 END AS cc_ppm
      FROM deg d LEFT JOIN pv ON pv.vid = d.vid
      ORDER BY d.vid"""

  private val emb38 = GraftQuery(
    "emb38_triangle_count",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.triangles(edges).orderBy(col("vid"))
    },
    Some(triangleOracle))

  // -------------------------------------------------------------- emb39
  // PERSONALIZED PageRank / TrustRank (GraphOps.personalizedPageRank)
  // — corpus-trust propagation: teleport mass lands only on a vetted
  // SEED set (vec_id % 10 = 0 here), so rank measures reachability
  // from the seeds through nearest-neighbor edges — "keep what the
  // graph pulls close to what we trust". Same exact BIGINT
  // fixed-point dynamics as emb37; an unreachable vector ranks
  // exactly 0 (integer arithmetic, no epsilon fog).
  private def pprIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      val prev = s"ppr${i - 1}"
      s"""pc$i AS (
        SELECT e.dst AS vid, CAST(SUM(p.pr // e.deg_out) AS BIGINT) AS s
        FROM ed e JOIN $prev p ON p.vid = e.src
        GROUP BY e.dst),
      ppr$i AS MATERIALIZED (
        SELECT b.vid, b.tele + (85 * COALESCE(c.s, 0)) // 100 AS pr
        FROM prb b LEFT JOIN pc$i c ON c.vid = b.vid)"""
    }.mkString(",\n      ")

  private def trustRankOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS MATERIALIZED (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      verts AS (
        SELECT vec_id AS vid, vec_id % 10 = 0 AS seed
        FROM embeddings),
      nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts WHERE seed),
      outdeg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg_out
        FROM edges GROUP BY src),
      prb AS MATERIALIZED (
        SELECT v.vid,
          CASE WHEN v.seed
            THEN ((1000000000000 * 15) // 100) // nn.n
            ELSE 0 END AS tele,
          CASE WHEN v.seed THEN 1000000000000 // nn.n
            ELSE 0 END AS p0
        FROM verts v, nn),
      ed AS MATERIALIZED (
        SELECT e.src, e.dst, o.deg_out
        FROM edges e JOIN outdeg o ON o.src = e.src),
      ppr0 AS (SELECT vid, p0 AS pr FROM prb),
      ${pprIterCtes(3)}
      SELECT p.vid, COALESCE(o.deg_out, 0) AS deg_out, p.pr
      FROM ppr3 p LEFT JOIN outdeg o ON o.src = p.vid
      ORDER BY p.vid"""

  private val emb39 = GraftQuery(
    "emb39_trustrank",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.personalizedPageRank(edges,
          embs.select(col("vec_id").as("vid"),
            (col("vec_id") % 10 === 0).as("seed")), iters = 3)
        .orderBy(col("vid"))
    },
    Some(trustRankOracle))

  // -------------------------------------------------------------- emb40
  // Synchronous LPA COMMUNITIES (GraphOps.labelPropagation) over the
  // kNN graph — the diversity-balancing unit for sampling ("per
  // community, not per document") and the clump detector near-dup
  // pipelines consume. Deterministic by construction: synchronous
  // rounds, majority vote, ties to the smallest label — the
  // async/random-order LPA variants converge faster but are
  // irreproducible, which a data pipeline cannot accept. The oracle
  // unrolls the same three rounds.
  private val lpaUndCtes = s"""
      und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM edges WHERE src <> dst),
      adj AS MATERIALIZED (
        SELECT u AS vid, v AS nbr FROM und
        UNION ALL SELECT v AS vid, u AS nbr FROM und)"""

  private def lpaIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""vt$i AS (
        SELECT a.vid, l.label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM adj a JOIN l${i - 1} l ON l.vid = a.nbr
        GROUP BY a.vid, l.label),
      l$i AS MATERIALIZED (
        SELECT vid, label FROM (
          SELECT vid, label, ROW_NUMBER() OVER (PARTITION BY vid
            ORDER BY votes DESC, label) AS rn
          FROM vt$i) WHERE rn = 1)"""
    }.mkString(",\n      ")

  // Shared by emb40 and its maintained twin cdc50 (the bm25Oracle
  // doctrine: one oracle text, two pinned surfaces).
  private def lpaOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      ${lpaUndCtes},
      l0 AS (SELECT DISTINCT vid, vid AS label FROM adj),
      ${lpaIterCtes(3)},
      sizes AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
        FROM l3 GROUP BY label)
      SELECT l.vid, l.label AS community, s.csize
      FROM l3 l JOIN sizes s ON s.label = l.label
      ORDER BY l.vid"""

  private val emb40 = GraftQuery(
    "emb40_community_lpa",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.labelPropagation(edges, rounds = 3)
        .orderBy(col("vid"))
    },
    Some(lpaOracle))

  // -------------------------------------------------------------- emb41
  // Multi-source BFS HOP DISTANCE (GraphOps.hopDistance) from the
  // emb39 seed set — the exact-hop complement of TrustRank's mass
  // view: "how many nearest-neighbor hops from the trusted corpus is
  // this document" (a curation radius gate). Min-propagation is
  // idempotent and order-free, so 3 unrolled rounds give exact BFS
  // ≤ 3 hops; unreached vertices report −1 exactly.
  private def bfsIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""nx$i AS (
        SELECT a.vid, MIN(d.dist + 1) AS nd
        FROM adj a JOIN d${i - 1} d ON d.vid = a.nbr
        WHERE d.dist IS NOT NULL
        GROUP BY a.vid),
      d$i AS MATERIALIZED (
        SELECT v.vid,
          CASE WHEN v.dist IS NULL THEN n.nd
               WHEN n.nd IS NULL THEN v.dist
               ELSE LEAST(v.dist, n.nd) END AS dist
        FROM d${i - 1} v LEFT JOIN nx$i n ON n.vid = v.vid)"""
    }.mkString(",\n      ")

  private def hopDistanceOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      ${lpaUndCtes},
      d0 AS (
        SELECT vec_id AS vid,
          CASE WHEN vec_id % 10 = 0 THEN CAST(0 AS BIGINT) END AS dist
        FROM embeddings),
      ${bfsIterCtes(3)}
      SELECT vid, COALESCE(dist, -1) AS dist
      FROM d3
      ORDER BY vid"""

  private val emb41 = GraftQuery(
    "emb41_hop_distance",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.hopDistance(edges,
          embs.select(col("vec_id").as("vid"),
            (col("vec_id") % 10 === 0).as("seed")), rounds = 3)
        .orderBy(col("vid"))
    },
    Some(hopDistanceOracle))

  // -------------------------------------------------------------- emb42
  // Greedy BEAM SEARCH over the kNN graph
  // (SimilarityOps.graphBeamSearch) — the graph-traversal ANN family
  // (HNSW/NSG class) completing the ladder next to LSH/IVF/PQ:
  // search WALKS the emb29 graph from a fixed entry instead of
  // probing quantizer cells, so per-query cost is
  // rounds·beam·degree lookups, never a corpus scan. The oracle
  // unrolls the three expand-score-prune rounds exactly.
  private def beamIterCtes(iters: Int, beam: Int): String =
    (1 to iters).map { i =>
      val prev = s"bm${i - 1}"
      s"""cd$i AS (
        SELECT DISTINCT query_id, vec_id FROM (
          SELECT p.query_id, a.nbr AS vec_id
          FROM $prev p JOIN adj a ON a.vid = p.vec_id
          UNION ALL SELECT query_id, vec_id FROM $prev)),
      sc$i AS (
        SELECT c.query_id, c.vec_id,
          (${dotSql("q.q_emb", "e.embedding", 64)})
            / (q.q_en * e.en) AS cos
        FROM cd$i c
        JOIN base e ON e.vec_id = c.vec_id
        JOIN qs q ON q.query_id = c.query_id),
      bm$i AS MATERIALIZED (
        SELECT query_id, vec_id, cos FROM (
          SELECT sc$i.*, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id) AS rn
          FROM sc$i) WHERE rn <= $beam)"""
    }.mkString(",\n      ")

  private val emb42 = GraftQuery(
    "emb42_graph_beam_search",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      SimilarityOps.graphBeamSearchFixedEntry(embs,
          SimilarityOps.knnGraph(embs))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS MATERIALIZED (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      adj AS MATERIALIZED (
        SELECT src AS vid, dst AS nbr FROM edges
        UNION
        SELECT dst AS vid, src AS nbr FROM edges),
      qs AS MATERIALIZED (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS q_en
        FROM base WHERE vec_id < 8),
      bm0 AS MATERIALIZED (
        SELECT q.query_id, CAST(0 AS BIGINT) AS vec_id,
          (${dotSql("q.q_emb", "b.embedding", 64)})
            / (q.q_en * b.en) AS cos
        FROM qs q JOIN base b ON b.vec_id = 0),
      ${beamIterCtes(3, 8)}
      SELECT query_id, vec_id AS neighbor_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk, cos
      FROM bm3 WHERE vec_id <> query_id
      QUALIFY rnk <= 4
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb43
  // CELL-SEEDED beam search (SimilarityOps.graphBeamSearchFrom) —
  // the IVF→graph HYBRID, the production configuration the
  // GraphSkylineProbe measured (fixed entry stalls at its own
  // connected component — 13% recall on the 10-sheet corpus; cell
  // seeding recovers 100%): each query's beam starts at a
  // representative (min vec_id) of the rank-1 members of its 2
  // nearest cells, then walks the graph. The oracle replays seeding
  // and the unrolled rounds exactly.
  private val emb43 = GraftQuery(
    "emb43_beam_cell_seeded",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val ranked = SimilarityOps.rankedCellAssignments(embs)
      val cellRep = ranked.filter(col("rn") === 1)
        .groupBy("cid").agg(min("vec_id").as("entry"))
      val entries = ranked
        .filter(col("vec_id") < 8 && col("rn") <= 2)
        .join(cellRep, Seq("cid"))
        .select(col("vec_id").as("query_id"),
          col("entry").as("vec_id"))
      SimilarityOps.graphBeamSearchFrom(embs,
          SimilarityOps.knnGraph(embs), entries)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS MATERIALIZED (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      adj AS MATERIALIZED (
        SELECT src AS vid, dst AS nbr FROM edges
        UNION
        SELECT dst AS vid, src AS nbr FROM edges),
      qs AS MATERIALIZED (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS q_en
        FROM base WHERE vec_id < 8),
      cellrep AS (
        SELECT cid, CAST(MIN(vec_id) AS BIGINT) AS entry
        FROM assign WHERE rn = 1 GROUP BY cid),
      ent AS (
        SELECT DISTINCT a.vec_id AS query_id, r.entry AS vec_id
        FROM assign a JOIN cellrep r ON r.cid = a.cid
        WHERE a.vec_id < 8 AND a.rn <= 2),
      bm0 AS MATERIALIZED (
        SELECT e.query_id, e.vec_id,
          (${dotSql("q.q_emb", "b.embedding", 64)})
            / (q.q_en * b.en) AS cos
        FROM ent e
        JOIN base b ON b.vec_id = e.vec_id
        JOIN qs q ON q.query_id = e.query_id),
      ${beamIterCtes(3, 8)}
      SELECT query_id, vec_id AS neighbor_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk, cos
      FROM bm3 WHERE vec_id <> query_id
      QUALIFY rnk <= 4
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb44
  // Community-balanced sampling (GraphOps.communitySample) — k=2
  // deterministic representatives per emb40 community: the diversity
  // knob ("sample per clump, not per document"); selection by the
  // content-independent doc08 hash, stable under reprocessing. The
  // engine runs the skew-proof two-level top-k (per-salt then
  // merge — a giant community never funnels through one task); the
  // oracle takes the direct single-window top-k, pinning the
  // two-level reduction LOSSLESS.
  // Shared by emb44 and its maintained twin cdc51.
  private def communitySampleOracle: String = s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS (
        SELECT vec_id AS src, nbr_id AS dst FROM g WHERE rnk <= 4),
      ${lpaUndCtes},
      l0 AS (SELECT DISTINCT vid, vid AS label FROM adj),
      ${lpaIterCtes(3)},
      hashed AS (
        SELECT vid, label AS community,
          CAST(('0x' || substring(md5(CAST(vid AS VARCHAR)), 1, 10))
            AS BIGINT) AS h
        FROM l3),
      rk AS (
        SELECT vid, community,
          CAST(ROW_NUMBER() OVER (PARTITION BY community
            ORDER BY h, vid) AS BIGINT) AS rnk
        FROM hashed)
      SELECT vid, community, rnk FROM rk
      WHERE rnk <= 2
      ORDER BY community, rnk"""

  private val emb44 = GraftQuery(
    "emb44_community_sample",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      GraphOps.communitySample(
          GraphOps.labelPropagation(edges, rounds = 3)
            .select(col("vid"), col("community")), k = 2)
        .orderBy(col("community"), col("rnk"))
    },
    Some(communitySampleOracle))

  // -------------------------------------------------------------- emb45
  // PAGERANK WITH DANGLING-MASS REDISTRIBUTION (GraphOps.pageRank,
  // redistributeDangling = true) — the general-edge-list form: the
  // kNN graph has no sinks (every vector emits k edges), but a
  // filtered graph (the doc17 dup graph, a pruned web graph) does,
  // and there the default leak loses their mass every round. Here
  // every 7th vector's out-edges are dropped (the vectors keep their
  // IN-edges, so they still accumulate rank — true sinks), and each
  // round the sinks' damped mass is redistributed over the teleport
  // distribution (the standard convention), conserving total mass to
  // the truncation bound (GraphOpsSpec pins conservation). Same
  // BIGINT fixed-point arithmetic; the oracle replays the per-round
  // dangling sum and the ((85·D) div 100) div n share exactly.
  private def pageRankDanglingIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""dg$i AS (
        SELECT CAST(COALESCE(SUM(p.pr), 0) AS BIGINT) AS d
        FROM $prev p JOIN dgl ON dgl.vid = p.vid),
      c$i AS (
        SELECT e.dst AS vid, CAST(SUM(p.pr // e.deg_out) AS BIGINT) AS s
        FROM ed e JOIN $prev p ON p.vid = e.src
        GROUP BY e.dst),
      pr$i AS MATERIALIZED (
        SELECT b.vid, b.tele + (85 * COALESCE(c.s, 0)) // 100
          + ((85 * dg$i.d) // 100) // b.n AS pr
        FROM prb b LEFT JOIN c$i c ON c.vid = b.vid, dg$i)"""
    }.mkString(",\n      ")

  private val emb45 = GraftQuery(
    "emb45_pagerank_dangling",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val edges = SimilarityOps.knnGraph(embs)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        .filter(col("src") % 7 =!= 0)
      GraphOps.pageRank(edges,
          embs.select(col("vec_id").as("vid")), iters = 3,
          redistributeDangling = true)
        .orderBy(col("vid"))
    },
    Some(s"""
      WITH ${knnGraphCtes(nProbe = 2)},
      edges AS MATERIALIZED (
        SELECT vec_id AS src, nbr_id AS dst FROM g
        WHERE rnk <= 4 AND vec_id % 7 <> 0),
      verts AS (SELECT vec_id AS vid FROM embeddings),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),
      outdeg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg_out
        FROM edges GROUP BY src),
      dgl AS MATERIALIZED (
        SELECT v.vid FROM verts v
        WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = v.vid)),
      prb AS MATERIALIZED (
        SELECT v.vid, nn.n,
          ((1000000000000 * 15) // 100) // nn.n AS tele,
          1000000000000 // nn.n AS p0
        FROM verts v, nn),
      ed AS MATERIALIZED (
        SELECT e.src, e.dst, o.deg_out
        FROM edges e JOIN outdeg o ON o.src = e.src),
      pr0 AS (SELECT vid, p0 AS pr FROM prb),
      ${pageRankDanglingIterCtes(3)}
      SELECT p.vid, COALESCE(o.deg_out, 0) AS deg_out, p.pr
      FROM pr3 p LEFT JOIN outdeg o ON o.src = p.vid
      ORDER BY p.vid"""))

  // ---------------------------------------------------- q62 / cdc36
  // Histogram QUANTILE sketch (SketchOps.histSketch/histQuantiles) —
  // the order-statistics member of the sketch family (q57 HLL, q58
  // KMV, doc39 CMS, doc42 Bloom): w=64 BIGINT bin counters per
  // l_returnflag over the registered price-cents domain [0, 10.5M),
  // answering p50/p90/p99 from ≤ 64 rows of state per group with the
  // equi-width guarantee |est − truth| < bin width. All arithmetic
  // is integer (ceil-rank, truncating interpolation), replayed
  // verbatim by the oracle. cdc36 serves the same report from the
  // INCREMENTALLY maintained bin table — counters are pure sums, so
  // batched == one-shot bit-exactly (the cdc33 argument at
  // order-statistics grain).
  private val histLo = 0L
  private val histHi = 10500000L
  private val histW = 64
  private val histQs = Seq(500000L, 900000L, 990000L)

  private val histOracle = s"""
      WITH vals AS (
        SELECT l_returnflag AS grp,
          CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem),
      hist AS (
        SELECT grp,
          LEAST(63, GREATEST(0, (v * 64) // 10500000)) AS bin,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM vals GROUP BY 1, 2),
      cum AS (
        SELECT grp, bin, cnt,
          CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bin)
            AS BIGINT) AS cum
        FROM hist),
      tg AS (
        SELECT h.grp, CAST(SUM(cnt) AS BIGINT) AS n,
          CAST(q.q_ppm AS BIGINT) AS q_ppm,
          GREATEST(1, (CAST(SUM(cnt) AS BIGINT) * q.q_ppm + 999999)
            // 1000000) AS target_rank
        FROM hist h, (VALUES (500000), (900000), (990000)) q(q_ppm)
        GROUP BY h.grp, q.q_ppm),
      hit AS (
        SELECT t.grp, t.q_ppm, t.n, t.target_rank, c.bin, c.cnt, c.cum,
          (c.bin * 10500000) // 64 AS bin_lo,
          ((c.bin + 1) * 10500000) // 64 AS bin_hi
        FROM tg t JOIN cum c ON c.grp = t.grp
        WHERE c.cum - c.cnt < t.target_rank AND t.target_rank <= c.cum)
      SELECT grp, q_ppm, n, target_rank, bin, bin_lo, bin_hi,
        bin_lo + ((bin_hi - bin_lo) * (target_rank - (cum - cnt)))
          // (cnt + 1) AS est
      FROM hit
      ORDER BY grp, q_ppm"""

  private def priceVals(li: DataFrame): DataFrame =
    li.select(col("l_returnflag").as("grp"),
      floor(col("l_extendedprice") * 100).cast("long").as("v"))

  private def histReport(hist: DataFrame): DataFrame =
    SketchOps.histQuantiles(hist, "grp", histQs, histLo, histHi, histW)
      .orderBy(col("grp"), col("q_ppm"))

  private val q62 = GraftQuery(
    "q62_quantile_sketch",
    (s, dir) => {
      val vals = priceVals(t(s, dir, "lineitem"))
      histReport(SketchOps.histSketch(vals, "grp", "v",
        histLo, histHi, histW))
    },
    Some(histOracle))

  private val cdc36 = GraftQuery(
    "cdc36_incremental_quantile",
    (s, dir) => {
      import s.implicits._
      val table = "cdc36_hist"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val li = t(s, dir, "lineitem")
      def part(i: Int) =
        priceVals(li.filter(pmod($"l_orderkey", lit(3)) === i))
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalHist.applyBatch(s, table, part(p),
          "grp", "v", id, histLo, histHi, histW)
      }
      histReport(
        graft.streaming.IncrementalHist.readHist(s, table, "grp"))
    },
    Some(histOracle))

  // -------------------------------------------------------------- doc43
  // PARETO FRONTIER (SkylineOps.skyline) — multi-objective curation:
  // the documents nothing else beats simultaneously on (more tokens,
  // more distinct types, fewer bytes) — optimal under SOME monotone
  // preference, so the frontier is the scalarization-free keep-set.
  // The engine runs the two-phase grid skyline (lossless cell-corner
  // prune → exact test on the surviving shell only — the n²
  // dominance join never forms); the oracle brute-forces NOT EXISTS
  // over all pairs, pinning the LOSSLESSNESS of the prune, which is
  // the entire claim.
  private def docMetrics(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("n_chars"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "n_chars")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_types"))

  private val skylineOracle = """
      WITH wtok AS (
        SELECT doc_id, n_chars,
          UNNEST(string_split(TRIM(text), ' ')) AS w
        FROM documents),
      m AS (
        SELECT doc_id, n_chars,
          CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
        FROM wtok WHERE w <> '' GROUP BY doc_id, n_chars)
      SELECT a.doc_id, a.n_tokens, a.n_types, a.n_chars
      FROM m a
      WHERE NOT EXISTS (
        SELECT 1 FROM m b
        WHERE b.n_tokens >= a.n_tokens AND b.n_types >= a.n_types
          AND b.n_chars <= a.n_chars
          AND (b.n_tokens > a.n_tokens OR b.n_types > a.n_types
            OR b.n_chars < a.n_chars))
      ORDER BY a.doc_id"""

  private val doc43 = GraftQuery(
    "doc43_pareto_frontier",
    (s, dir) =>
      SkylineOps.skyline(docMetrics(t(s, dir, "documents")), "doc_id",
          maxCols = Seq("n_tokens", "n_types"),
          minCols = Seq("n_chars"))
        .orderBy(col("doc_id")),
    Some(skylineOracle))

  // -------------------------------------------------------------- cdc37
  // Incrementally-maintained Pareto frontier (IncrementalSkyline) —
  // doc43's skyline under APPEND-ONLY ingest, with the FRONTIER as
  // the only state: a point dominated once is dominated forever, so
  // frontier(S∪B) = skyline(frontier(S)∪B) and each batch folds
  // against frontier-sized state while the corpus is never
  // revisited. Idempotent by construction (the HLL/Bloom camp: ties
  // never dominate each other and the fold dedupes ids), so the
  // REPLAYED batch needs no watermark — the spec pins the
  // double-fold no-op. Served frontier must equal one-shot doc43;
  // doc43's brute-force oracle is the gate.
  private val cdc37 = GraftQuery(
    "cdc37_incremental_skyline",
    (s, dir) => {
      import s.implicits._
      val table = "cdc37_frontier"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) =
        docMetrics(docs.filter(pmod($"doc_id", lit(3)) === i))
      // batch 1 is REDELIVERED verbatim: idempotent fold, no-op
      Seq(0, 1, 1, 2).foreach { p =>
        graft.streaming.IncrementalSkyline.applyBatch(s, table,
          part(p), "doc_id", Seq("n_tokens", "n_types"),
          Seq("n_chars"))
      }
      graft.streaming.IncrementalSkyline.readFrontier(s, table,
          "doc_id", Seq("n_tokens", "n_types"), Seq("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(skylineOracle))

  // -------------------------------------------------------------- cdc42
  // Incrementally-maintained PRIORITY SAMPLE (IncrementalSample) —
  // doc48's deterministic bottom-k selector kept current under
  // document ingest. Bottom-k under the total order (priority,
  // doc_id) is a MERGEABLE summary (any global bottom-k member is in
  // its own batch's bottom-k), so folding per-batch bottom-ks into a
  // ≤ k-row TableSwap state equals the one-shot sample bit-for-bit —
  // and the fold is IDEMPOTENT (re-merging sampled rows cannot change
  // a bottom-k), pinned by the REDELIVERED batch in the harness. The
  // oracle is doc48's, verbatim: the maintained state must equal the
  // one-shot bottom-k over the full corpus.
  private val cdc42 = GraftQuery(
    "cdc42_incremental_sample",
    (s, dir) => {
      import s.implicits._
      val table = "cdc42_sample"
      graft.streaming.IncrementalSample.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      // (partition, batchId): batch 1 is REDELIVERED under its own id
      Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
        graft.streaming.IncrementalSample.applyBatch(s, table,
          part(p), batchId = b, k = 64)
      }
      graft.streaming.IncrementalSample.sample(s, table)
        .orderBy($"priority", $"doc_id")
    },
    Some(prioritySampleOracle))

  // -------------------------------------------------------------- cdc43
  // MAINTAINED RARITY-KEYWORD VIEW (IncrementalDocFreq) — doc49
  // served from an incrementally-maintained document-frequency
  // table. df is ADDITIVE under document-disjoint ingest, but word
  // keys are Zipf-distributed and every realistic batch contains the
  // common words — a merge-shaped bucketed table would touch every
  // bucket per fold (the cdc40 finding in vocabulary clothing) — so
  // the fold APPENDS per-batch (word, df_delta) rows into its own
  // `_b` generation and df is summed on read; the watermark carries
  // the additive corpus doc count N. The case a per-batch one-shot
  // gets wrong: a batch-local df calls every batch-rare word a
  // keyword; the maintained df knows which words are corpus-common.
  // Requesting the full corpus must equal the one-shot doc49 exactly
  // (same oracle), pinned through a REDELIVERED batch.
  private val cdc43 = GraftQuery(
    "cdc43_keyword_view",
    (s, dir) => {
      import s.implicits._
      val table = "cdc43_df"
      graft.streaming.IncrementalDocFreq.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      // (partition, batchId): batch 1 is REDELIVERED under its own id
      Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, b) =>
        graft.streaming.IncrementalDocFreq.applyBatch(s, table,
          part(p), batchId = b)
      }
      graft.streaming.IncrementalDocFreq.keywordView(s, table, docs,
          m = 3)
        .orderBy($"doc_id", $"rnk")
    },
    Some(rarityKeywordsOracle))

  // -------------------------------------------------------------- cdc44
  // MAINTAINED BM25 RETRIEVAL (IncrementalBm25) — doc19's ranked
  // retrieval served from an incrementally-maintained postings grid:
  // (word, doc_id, tf, dl) rows are immutable under document-disjoint
  // ingest and word keys are Zipf-distributed, so the storage is the
  // cdc43 append doctrine verbatim; N and avgdl's token total ride
  // the watermark as additive statistics. The serving pattern a
  // streaming curation pipeline needs: decontamination/attribution
  // queries against the CURRENT corpus, read cost ∝ the query terms'
  // postings (bucket-pruned, word-IN-pushed). Full-corpus query ==
  // the one-shot doc19 exactly (same oracle), pinned through a
  // REDELIVERED batch and a MID-STREAM incremental bucket compaction
  // (the serve reads through the compacted layout).
  private val cdc44 = GraftQuery(
    "cdc44_bm25_view",
    (s, dir) => {
      import s.implicits._
      val table = "cdc44_postings"
      graft.streaming.IncrementalBm25.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      // (partition, batchId): batch 1 is REDELIVERED under its own id
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalBm25.applyBatch(s, table,
          part(p), batchId = b)
      }
      graft.streaming.IncrementalBm25.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalBm25.applyBatch(s, table,
        part(2), batchId = 2L)
      graft.streaming.IncrementalBm25.queryView(s, table,
        Seq("spark", "merge", "window"), k = 20)
    },
    Some(LlmQueries.bm25Oracle))

  // -------------------------------------------------------------- cdc45
  // MAINTAINED CONTAINMENT INDEX (IncrementalContainment) — doc36's
  // near-superset detection kept current under ingest: the
  // (shingle, doc_id) inverted index is append-shaped (immutable
  // rows, near-uniform keys — the cdc40 doctrine), df/kept-ness and
  // prefixes are recomputed at read time because shingle rarity
  // DRIFTS as the corpus grows (a frozen ingest-time prefix silently
  // loses the lossless-filter guarantee). The case a one-shot leaves
  // open — a late-arriving near-superset of an early doc — is served
  // per batch by batchPairs (spec-pinned); the full report over the
  // ingested corpus must equal the one-shot doc36 exactly (same
  // oracle), pinned through a REDELIVERED batch and a MID-STREAM
  // incremental bucket compaction.
  private val cdc45 = GraftQuery(
    "cdc45_containment_index",
    (s, dir) => {
      import s.implicits._
      val table = "cdc45_shingles"
      graft.streaming.IncrementalContainment.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      // nBuckets=8 at harness scale: per-bucket compaction is one
      // write job per fragmented bucket per twin, and the oracle only
      // needs the compacted-layout READ path exercised — the bucket
      // count's scale behavior is the probe's job (Sf1ProbeR14)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalContainment.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalContainment.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalContainment.applyBatch(s, table,
        part(2), batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalContainment.report(s, table)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(SelectionQueries.containmentOracle))

  // -------------------------------------------------------------- cdc46
  // MAINTAINED kNN GRAPH (IncrementalKnnGraph) — emb29's neighbor
  // graph kept current under vector ingest: new vectors find their
  // candidates through the maintained IVF cells (forward — the emb29
  // query shape, cost ∝ batch × probed-cell size) and existing
  // vectors are REPAIRED only where a new vector can enter their
  // top-k (reverse: probers of the batch's home cells × batch — the
  // NN-descent local-join bound — appended only at/above the
  // committed k-th-cos threshold, which is exact because top-k is
  // monotone). The backbone of the emb37–44 analytics family, no
  // longer rebuilt per refresh. Served graph == one-shot emb29
  // exactly (same oracle), pinned through a REDELIVERED batch and a
  // MID-STREAM incremental bucket compaction.
  private val cdc46 = GraftQuery(
    "cdc46_knn_graph_view",
    (s, dir) => {
      val table = "cdc46_knn"
      graft.streaming.IncrementalKnnGraph.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val embs = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def part(lo: Long, hi: Long) =
        embs.filter(col("vec_id") >= lo && col("vec_id") < hi)
      // contiguous ranges: batch 0 carries vec 0..7 (the centroid
      // seeding contract, matching the one-shot's vec_id < 8 rule);
      // batch 1 is REDELIVERED under its own id
      Seq((0L, 150L, 0L), (150L, 300L, 1L), (150L, 300L, 1L))
        .foreach { case (lo, hi, b) =>
          graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
            part(lo, hi), b)
        }
      graft.streaming.IncrementalKnnGraph.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
        part(300L, Long.MaxValue), 2L)
      graft.streaming.IncrementalKnnGraph.graphView(s, table)
        .orderBy(col("vec_id"), col("rnk"))
    },
    Some(s"""
      WITH ${knnGraphCtes(nProbe = 2)}
      SELECT vec_id, nbr_id, rnk, cos FROM g
      WHERE rnk <= 4
      ORDER BY vec_id, rnk"""))

  // -------------------------------------------------------------- cdc47
  // MAINTAINED MEDIA NEAR-DUP INDEX (IncrementalMediaDedup) — mm06's
  // banded-pHash dedup kept current under media ingest: the postings
  // (band, key, doc_id, phash) are immutable under document-disjoint
  // batches and band keys are near-uniform hash slices — the append
  // doctrine verbatim (doc25's text sibling over the binary column).
  // No historical media byte is ever re-hashed; per-batch candidate
  // discovery reads ∝ the batch's band keys' buckets (batchPairs,
  // spec-pinned). The full report == one-shot mm06 exactly (same
  // oracle), pinned through a REDELIVERED batch and a MID-STREAM
  // incremental bucket compaction.
  private val cdc47 = GraftQuery(
    "cdc47_media_dedup_view",
    (s, dir) => {
      import s.implicits._
      val table = "cdc47_phash"
      graft.streaming.IncrementalMediaDedup.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val media =
        MultimodalOps.toMediaColumns(t(s, dir, "documents"))
      def part(i: Int) = media.filter(pmod($"doc_id", lit(3)) === i)
      // batch 1 is REDELIVERED under its own id
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalMediaDedup.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalMediaDedup.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalMediaDedup.applyBatch(s, table,
        part(2), batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalMediaDedup.report(s, table)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(phashNearDupOracle))

  // Shared by doc51 and its maintained twin cdc48 (the bm25Oracle
  // doctrine: one oracle text, two pinned surfaces). Restates BOTH
  // rankings — doc19's BM25 top-20 (lexical) and emb05's probed-IVF
  // top-20 for query vector 10 (semantic) — then reciprocal-rank
  // fusion 1/(60+r) over their union, terms added in fixed lex+sem
  // order (integer ranks → exact doubles).
  private def rrfOracle: String = {
    import LlmQueries.{dotSql, normSql}
    s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS term
        FROM documents),
      toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
      stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
        FROM dl),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks2
        WHERE term IN ('spark', 'merge', 'window')
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      lscored AS (
        SELECT tf.doc_id, tf.term,
          ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
             / (CAST(d.df AS DOUBLE) + 0.5))
          * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
          / (CAST(tf.tf AS DOUBLE)
             + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE)
               / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
            AS score
        FROM tf JOIN dfreq d USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats s),
      agg AS (
        SELECT doc_id,
          COALESCE(MAX(CASE WHEN term = 'merge' THEN score END), 0.0)
            + COALESCE(MAX(CASE WHEN term = 'spark' THEN score END), 0.0)
            + COALESCE(MAX(CASE WHEN term = 'window' THEN score END), 0.0)
            AS bm25
        FROM lscored GROUP BY doc_id),
      lex AS (
        SELECT doc_id, CAST(lex_rnk AS BIGINT) AS lex_rnk FROM (
          SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rnk
          FROM agg) WHERE lex_rnk <= 20),
      cent AS (
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
              DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      clustered AS (
        SELECT vec_id, embedding, en, cid FROM assign WHERE rn = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn, cid
        FROM assign WHERE vec_id = 10 AND rn <= 2),
      sscored AS (
        SELECT q.query_id, c.vec_id,
          (${dotSql("q_emb", "c.embedding", 64)}) / (q.qn * c.en) AS cos
        FROM clustered c JOIN q
          ON c.cid = q.cid AND c.vec_id <> q.query_id),
      sem AS (
        SELECT vec_id AS doc_id, CAST(rnk AS BIGINT) AS sem_rnk FROM (
          SELECT vec_id,
            ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rnk
          FROM sscored) WHERE rnk <= 20)
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        lex.lex_rnk AS lex_rnk, sem.sem_rnk AS sem_rnk,
        COALESCE(CAST(1.0 AS DOUBLE)
            / (CAST(60.0 AS DOUBLE) + CAST(lex.lex_rnk AS DOUBLE)),
          CAST(0.0 AS DOUBLE))
        + COALESCE(CAST(1.0 AS DOUBLE)
            / (CAST(60.0 AS DOUBLE) + CAST(sem.sem_rnk AS DOUBLE)),
          CAST(0.0 AS DOUBLE)) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
      ORDER BY rrf DESC, doc_id"""
  }

  // -------------------------------------------------------------- doc51
  // HYBRID RETRIEVAL FUSION (RetrievalOps.rrfFuse) — reciprocal-rank
  // fusion (c = 60, the public standard) of the engine's two
  // retrieval halves: doc19's BM25 top-20 (lexical) and emb05's
  // probed-IVF cosine top-20 for a corpus query vector (semantic).
  // Rank-based, so the incomparable score scales never need
  // calibration — the ranking a curation / decontamination /
  // attribution pipeline actually queries. Ranks are WINDOW-FREE
  // (orderBy+limit cut, then a k²-broadcast count-better rank over
  // the ≤ 20 survivors — no partition-less window anywhere).
  private val doc51 = GraftQuery(
    "doc51_rrf_fusion",
    (s, dir) => {
      val lex = RetrievalOps.rankedTopK(
          RetrievalOps.bm25Scores(t(s, dir, "documents"),
            Seq("spark", "merge", "window")), "bm25", 20)
        .withColumnRenamed("rnk", "lex_rnk")
      val sem = SimilarityOps.ivfTopKProbed(t(s, dir, "embeddings"),
          nProbe = 2, queryLo = 10, queryHi = 11, k = 20)
        .select(col("neighbor_id").as("doc_id"),
          col("rnk").as("sem_rnk"))
      RetrievalOps.rrfFuse(lex, sem)
        .orderBy(col("rrf").desc, col("doc_id"))
    },
    Some(rrfOracle))

  // -------------------------------------------------------------- cdc48
  // MAINTAINED RRF FUSION — doc51 served from the two maintained
  // indexes: the BM25 postings grid (IncrementalBm25, read at its
  // committed watermark snapshot) and the incremental IVF index
  // (IncrementalAnn, anti-join-idempotent appends over frozen
  // centroids). Serve cost ∝ the query terms' postings buckets + the
  // probed cells' partitions — neither corpus is rescanned. Equals
  // the one-shot doc51 exactly (same oracle), pinned through
  // REDELIVERED batches on both state families and a MID-STREAM
  // postings compaction. NEW in r16: the serve is WAVE-PINNED
  // (WaveMark) — both families fold per ingest wave, the pipeline
  // commits one wave marker after each, and the fused read first
  // REQUIRES both families at the pinned wave (the r15 verdict's
  // version-skew hazard: a paused stream on one family would
  // otherwise silently fuse two corpus versions; WaveMarkSpec pins
  // the refusal).
  private val cdc48 = GraftQuery(
    "cdc48_rrf_fusion_view",
    (s, dir) => {
      import s.implicits._
      val pTable = "cdc48_postings"
      graft.streaming.IncrementalBm25.tables(pTable)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val aTable = "cdc48_ivf"
      (Seq(aTable, graft.streaming.IncrementalAnn.centTable(aTable),
        s"${aTable}_wm", s"${aTable}_wm_stage", s"${aTable}_wm_old") ++
        graft.streaming.WaveMark.tables("cdc48_wave"))
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def dpart(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      val embs = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding")
      def epart(lo: Long, hi: Long) =
        embs.filter($"vec_id" >= lo && $"vec_id" < hi)
      // one ingest WAVE = both families fold the wave's batch, then
      // the pipeline commits ONE marker naming both committed
      // versions (batch id + delete epoch — an erasure mutates a
      // family without moving its watermark, so the epoch is part of
      // the pin). Wave 1's batch is REDELIVERED on both families
      // (no-ops); compaction runs mid-stream like before.
      import graft.streaming.WaveMark.FamilyVersion
      def versions() = Map(
        "postings" -> FamilyVersion(
          graft.streaming.IncrementalBm25.committedBatch(s, pTable),
          graft.streaming.AppendGrid.mutationEpoch(s, pTable)),
        "ivf" -> FamilyVersion(
          graft.streaming.IncrementalAnn.committed(s, aTable),
          graft.streaming.IncrementalAnn.mutationEpoch(s, aTable)))
      def wave(b: Long, dp: Int, lo: Long, hi: Long): Unit = {
        graft.streaming.IncrementalBm25.applyBatch(s, pTable,
          dpart(dp), batchId = b)
        graft.streaming.IncrementalAnn.indexBatch(s, aTable,
          epart(lo, hi))
        graft.streaming.IncrementalAnn.commitBatch(s, aTable, b)
        graft.streaming.WaveMark.commitWave(s, "cdc48_wave", b,
          versions())
      }
      wave(0L, 0, 0L, 150L)
      wave(1L, 1, 150L, 300L)
      wave(1L, 1, 150L, 300L) // redelivery
      graft.streaming.IncrementalBm25.compactBuckets(s, pTable,
        minParts = 2)
      wave(2L, 2, 300L, Long.MaxValue)
      // WAVE-PINNED serve: refuse on any cross-family version skew
      graft.streaming.WaveMark.requireAtWave(s, "cdc48_wave",
        versions())
      val lex = RetrievalOps.rankedTopK(
          graft.streaming.IncrementalBm25.queryView(s, pTable,
            Seq("spark", "merge", "window"), k = 20), "bm25", 20)
        .withColumnRenamed("rnk", "lex_rnk")
      val sem = graft.streaming.IncrementalAnn.searchTopK(s, aTable,
          embs.filter($"vec_id" === 10)
            .select($"vec_id".as("query_id"),
              $"embedding".as("q_emb")),
          nProbe = 2, k = 20)
        .select($"neighbor_id".as("doc_id"), $"rnk".as("sem_rnk"))
      RetrievalOps.rrfFuse(lex, sem)
        .orderBy($"rrf".desc, $"doc_id")
    },
    Some(rrfOracle))

  // -------------------------------------------------------------- cdc49
  // ANALYTICS OVER THE MAINTAINED GRAPH — emb37's PageRank served
  // from the cdc46 edge state instead of a per-refresh graph rebuild:
  // the composition the maintained backbone exists for (a curation
  // pipeline re-ranks representativeness per ingest wave; only the
  // fold is incremental — the power iteration itself reads the
  // maintained top-k edges, which cdc46 pins bit-equal to the
  // one-shot graph, so the ranks land on emb37's own oracle).
  // Harness folds through a REDELIVERED batch + a MID-STREAM bucket
  // compaction like cdc46.
  private val cdc49 = GraftQuery(
    "cdc49_pagerank_view",
    (s, dir) => {
      val edges = maintainedKnnEdges(s, dir, "cdc49_knn")
      GraphOps.pageRank(edges,
          t(s, dir, "embeddings").select(col("vec_id").as("vid")),
          iters = 3)
        .orderBy(col("vid"))
    },
    Some(pageRankOracle))

  /** Shared cdc49/50/51 harness: build the maintained kNN graph from
    * scratch through a REDELIVERED batch + a MID-STREAM bucket
    * compaction (the cdc46 discipline), return its served edge
    * list — the composition surface the emb37–44 analytics family
    * reads instead of a per-refresh graph rebuild. */
  private def maintainedKnnEdges(s: SparkSession, dir: String,
      table: String): DataFrame = {
    graft.streaming.IncrementalKnnGraph.tables(table)
      .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
    val vecs = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def part(lo: Long, hi: Long) =
      vecs.filter(col("vec_id") >= lo && col("vec_id") < hi)
    Seq((0L, 150L, 0L), (150L, 300L, 1L), (150L, 300L, 1L))
      .foreach { case (lo, hi, b) =>
        graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
          part(lo, hi), b)
      }
    graft.streaming.IncrementalKnnGraph.compactBuckets(s, table,
      minParts = 2)
    graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
      part(300L, Long.MaxValue), 2L)
    // materialized ONCE: every analytics consumer reads the edge list
    // 2+ times (undirected closure unions it with itself; PageRank
    // derives outdeg and the join side from it), and the lazy form
    // re-ran the serve's grid scan + rank window per consumption —
    // measured 30-50% of each analytics phase at sf0.1. At scale this
    // is the guide's "materialise an intermediate" rule: the served
    // edge list is the loop input, cut its lineage once.
    graft.streaming.IncrementalKnnGraph.graphView(s, table)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .localCheckpoint()
  }

  // -------------------------------------------------------------- cdc50
  // LPA COMMUNITIES OVER THE MAINTAINED GRAPH — emb40 served from the
  // cdc46 edge state instead of a per-refresh rebuild (the cdc49
  // composition pattern, applied to the community unit a curation
  // pipeline actually schedules per ingest wave: "sample per clump,
  // not per document" needs CURRENT clumps). The maintained edges are
  // pinned bit-equal to the one-shot graph, so the communities land
  // on emb40's own oracle through the redelivered batch + mid-stream
  // compaction.
  private val cdc50 = GraftQuery(
    "cdc50_lpa_view",
    (s, dir) =>
      GraphOps.labelPropagation(
          maintainedKnnEdges(s, dir, "cdc50_knn"), rounds = 3)
        .orderBy(col("vid")),
    Some(lpaOracle))

  // -------------------------------------------------------------- cdc51
  // COMMUNITY-BALANCED SAMPLING OVER THE MAINTAINED GRAPH — emb44
  // from the cdc46 edge state: the full per-wave curation step
  // (maintained graph → current communities → k stable
  // representatives per community) with zero graph rebuild. Lands on
  // emb44's own oracle.
  private val cdc51 = GraftQuery(
    "cdc51_community_sample_view",
    (s, dir) =>
      GraphOps.communitySample(
          GraphOps.labelPropagation(
              maintainedKnnEdges(s, dir, "cdc51_knn"), rounds = 3)
            .select(col("vid"), col("community")), k = 2)
        .orderBy(col("community"), col("rnk")),
    Some(communitySampleOracle))

  // -------------------------------------------------------------- cdc59
  // TRIANGLES / CLUSTERING COEFFICIENT OVER THE MAINTAINED GRAPH —
  // emb38 served from the cdc46 edge state (the cdc49 composition
  // pattern applied to the local-density audit: "is this region a
  // tight near-dup clump" is a per-ingest-wave question, and the
  // degree-oriented wedge plan reads CURRENT edges, zero rebuild).
  // Maintained edges are pinned bit-equal to the one-shot graph, so
  // counts land on emb38's own oracle through the redelivered batch
  // + mid-stream compaction.
  private val cdc59 = GraftQuery(
    "cdc59_triangle_view",
    (s, dir) =>
      GraphOps.triangles(maintainedKnnEdges(s, dir, "cdc59_knn"))
        .orderBy(col("vid")),
    Some(triangleOracle))

  // -------------------------------------------------------------- cdc60
  // BFS HOP DISTANCE OVER THE MAINTAINED GRAPH — emb41's curation
  // radius gate ("how many nearest-neighbor hops from the trusted
  // corpus") served from the cdc46 edge state. Lands on emb41's own
  // oracle.
  private val cdc60 = GraftQuery(
    "cdc60_hop_distance_view",
    (s, dir) =>
      GraphOps.hopDistance(
          maintainedKnnEdges(s, dir, "cdc60_knn"),
          t(s, dir, "embeddings").select(col("vec_id").as("vid"),
            (col("vec_id") % 10 === 0).as("seed")), rounds = 3)
        .orderBy(col("vid")),
    Some(hopDistanceOracle))

  // -------------------------------------------------------------- cdc61
  // TRUSTRANK OVER THE MAINTAINED GRAPH — emb39's seeded trust
  // propagation ("keep what the graph pulls close to what we trust")
  // served from the cdc46 edge state: with cdc49/50/51/59/60 every
  // analytics member of the emb37-44 graph family (PageRank,
  // triangles, TrustRank, LPA, BFS, community sampling) now composes
  // over maintained state; emb42/43's beam search is graph-traversal
  // SERVING, already covered by the maintained index's own
  // neighborsOf surface. Lands on emb39's own oracle.
  private val cdc61 = GraftQuery(
    "cdc61_trustrank_view",
    (s, dir) =>
      GraphOps.personalizedPageRank(
          maintainedKnnEdges(s, dir, "cdc61_knn"),
          t(s, dir, "embeddings").select(col("vec_id").as("vid"),
            (col("vec_id") % 10 === 0).as("seed")), iters = 3)
        .orderBy(col("vid")),
    Some(trustRankOracle))

  // ------------------------------------------------- cdc52…cdc57
  // ERASURE across the maintained-index family (the r15 verdict's
  // top item): the engine's own decontamination operators (doc13,
  // doc44) discover contamination AFTER ingest, so every index must
  // absorb per-wave opt-outs without a rebuild. Each harness folds
  // through a REDELIVERED batch, ERASES the odd doc_id%7==3 slice,
  // folds a POST-DELETE batch, compacts (physical reclamation
  // mid-serve), RE-INSERTS the even half of the erased slice, and
  // must land exactly on the one-shot oracle over the surviving
  // corpus — df / N / avgdl / kept-ness / prefixes / thresholds all
  // recomputed as if the erased docs never existed.

  /** Rewrite a documents-corpus oracle onto the erasure harnesses'
    * SURVIVING corpus: erased = doc_id%7==3, re-inserted = its even
    * half, so the final corpus excludes exactly the odd half. */
  private def minusErasedDocs(oracle: String): String = {
    val i = oracle.indexOf("WITH")
    oracle.substring(0, i) + """WITH kept_docs AS (
        SELECT * FROM documents
        WHERE NOT (doc_id % 7 = 3 AND doc_id % 2 <> 0)),
      """ + oracle.substring(i + 4)
      .replace("FROM documents", "FROM kept_docs")
  }

  private def erasedDocs(df: DataFrame) =
    df.filter(pmod(col("doc_id"), lit(7)) === 3)

  private def reinsertedDocs(df: DataFrame) =
    df.filter(pmod(col("doc_id"), lit(7)) === 3 &&
      pmod(col("doc_id"), lit(2)) === 0)

  // -------------------------------------------------------------- cdc52
  // BM25 ERASURE — deleteDocs carries the docs' ingested text, so
  // the presence check prunes to their words' buckets; the ledger's
  // (count, Σdl) keeps N and avgdl exact; df falls out of the
  // tombstone-aware postings read. Serve == one-shot doc19 over the
  // surviving corpus.
  private val cdc52 = GraftQuery(
    "cdc52_bm25_erasure",
    (s, dir) => {
      import s.implicits._
      val table = "cdc52_postings"
      graft.streaming.IncrementalBm25.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalBm25.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalBm25.deleteDocs(s, table,
        erasedDocs(docs))
      // post-delete ingest (erased slice withheld — the curation
      // gate's job), mid-stream compaction physically reclaims, then
      // the re-insertion batch brings the erased slice's even half
      // back across ALL parts
      graft.streaming.IncrementalBm25.applyBatch(s, table,
        part(2).filter(pmod($"doc_id", lit(7)) =!= 3),
        batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalBm25.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalBm25.applyBatch(s, table,
        reinsertedDocs(docs), batchId = 3L, nBuckets = 8)
      graft.streaming.IncrementalBm25.queryView(s, table,
        Seq("spark", "merge", "window"), k = 20)
    },
    Some(minusErasedDocs(LlmQueries.bm25Oracle)))

  // -------------------------------------------------------------- cdc53
  // CONTAINMENT ERASURE — the cheapest delete in the family (pure
  // ledger append, O(ids), no grid read): read-time df absorbs the
  // deletion exactly like it absorbs rarity drift. Serve == one-shot
  // doc36 over the surviving corpus, through compaction on both
  // twins.
  private val cdc53 = GraftQuery(
    "cdc53_containment_erasure",
    (s, dir) => {
      import s.implicits._
      val table = "cdc53_shingles"
      graft.streaming.IncrementalContainment.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalContainment.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalContainment.deleteDocs(s, table,
        erasedDocs(docs).select("doc_id"))
      graft.streaming.IncrementalContainment.applyBatch(s, table,
        part(2).filter(pmod($"doc_id", lit(7)) =!= 3),
        batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalContainment.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalContainment.applyBatch(s, table,
        reinsertedDocs(docs), batchId = 3L, nBuckets = 8)
      graft.streaming.IncrementalContainment.report(s, table)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minusErasedDocs(SelectionQueries.containmentOracle)))

  // -------------------------------------------------------------- cdc54
  // LSH-DEDUP ERASURE — the bucketed index's ledger semantics:
  // erased docs stop colliding (lookup exclusion), the accumulated
  // pair LOG is served minus the ledger, a re-arriving doc
  // UN-DELETES itself, and vacuum physically reclaims mid-harness.
  // Serve == one-shot doc04 over the surviving corpus.
  private val cdc54 = GraftQuery(
    "cdc54_lsh_erasure",
    (s, dir) => {
      import s.implicits._
      val table = "cdc54_index"
      Seq(table, graft.streaming.IncrementalDedup.delsTable(table),
        s"${graft.streaming.IncrementalDedup.delsTable(table)}_stage",
        s"${table}_compacting", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      val pre = Seq(part(0), part(1), part(1)).map { b =>
        graft.streaming.IncrementalDedup.indexBatch(s, table, b)
      }
      graft.streaming.IncrementalDedup.deleteDocs(s, table,
        erasedDocs(docs).select("doc_id"))
      // post-delete batch (erased slice withheld), then re-insertion
      // (re-arriving erased docs un-delete themselves); the ledger
      // stays live — it also filters the accumulated pair log
      // (vacuum's physical reclamation is ErasureSpec's pin)
      val post2 = graft.streaming.IncrementalDedup.indexBatch(s, table,
        part(2).filter(pmod($"doc_id", lit(7)) =!= 3))
      val post3 = graft.streaming.IncrementalDedup.indexBatch(s, table,
        reinsertedDocs(docs))
      val cands = graft.streaming.IncrementalDedup.minusDeletedPairs(
        s, table,
        (pre :+ post2 :+ post3).reduce(_ unionByName _).distinct())
      val kept = docs.filter(!(pmod($"doc_id", lit(7)) === 3 &&
        pmod($"doc_id", lit(2)) =!= 0))
      DedupOps.verifyPairs(DedupOps.docShingles(kept), cands,
          minJ = 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minusErasedDocs(
      LlmQueries.minhashLshOracle(LlmQueries.bigramShCtes,
        minJ = 0.2))))

  // -------------------------------------------------------------- cdc55
  // SPAN ERASURE — the hard summary case: the _rep table's
  // membership was monotone-sound only without deletes, so
  // deleteDocs recounts the deleted docs' own keys within the
  // summary's covered generations and evicts the ones below 2 live
  // owners — a span repeated ONLY via erased owners stops being cut.
  // Serve == one-shot doc50 over the surviving corpus, with the
  // summary built (full compact) BEFORE the delete.
  private val cdc55 = GraftQuery(
    "cdc55_span_erasure",
    (s, dir) => {
      import s.implicits._
      val table = "cdc55_spans"
      graft.streaming.IncrementalSpans.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalSpans.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      // summary first (the state the repair must fix), then erase
      graft.streaming.IncrementalSpans.compact(s, table)
      graft.streaming.IncrementalSpans.deleteDocs(s, table,
        erasedDocs(docs))
      graft.streaming.IncrementalSpans.applyBatch(s, table,
        part(2).filter(pmod($"doc_id", lit(7)) =!= 3),
        batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalSpans.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalSpans.applyBatch(s, table,
        reinsertedDocs(docs), batchId = 3L, nBuckets = 8)
      val kept = docs.filter(!(pmod($"doc_id", lit(7)) === 3 &&
        pmod($"doc_id", lit(2)) =!= 0))
      graft.streaming.IncrementalSpans.removalView(s, table, kept)
        .orderBy($"doc_id")
    },
    Some(minusErasedDocs(spanRemovalOracle)))

  // -------------------------------------------------------------- cdc56
  // MEDIA ERASURE — the binary-column twin of cdc53: ledger append,
  // postings-minus-ledger serves, compaction reclaims. Serve ==
  // one-shot mm06 over the surviving corpus.
  private val cdc56 = GraftQuery(
    "cdc56_media_erasure",
    (s, dir) => {
      import s.implicits._
      val table = "cdc56_phash"
      graft.streaming.IncrementalMediaDedup.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val media =
        MultimodalOps.toMediaColumns(t(s, dir, "documents"))
      def part(i: Int) = media.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalMediaDedup.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalMediaDedup.deleteDocs(s, table,
        erasedDocs(media).select("doc_id"))
      graft.streaming.IncrementalMediaDedup.applyBatch(s, table,
        part(2).filter(pmod($"doc_id", lit(7)) =!= 3),
        batchId = 2L, nBuckets = 8)
      graft.streaming.IncrementalMediaDedup.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalMediaDedup.applyBatch(s, table,
        reinsertedDocs(media), batchId = 3L, nBuckets = 8)
      graft.streaming.IncrementalMediaDedup.report(s, table)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minusErasedDocs(phashNearDupOracle)))

  // -------------------------------------------------------------- cdc57
  // kNN-GRAPH ERASURE — the hard case: deleting vector v invalidates
  // every owner whose top-k contained v; repair re-runs those
  // owners' forward query (bounded by the probers state — the
  // reverse-insert argument in reverse) and RESETS their cached
  // k-th-cos thresholds, which deletion alone can lower. The harness
  // then keeps INGESTING after the delete — the serve stays exactly
  // one-shot only if the lowered thresholds admit the reverse pairs
  // the deletion re-opened — and finally re-inserts the even half.
  // Erased = vec_id%5==3 in [8, 300) (centroid seeds excluded: their
  // frozen centroid role persists, matching the one-shot's
  // vec_id < 8 rule over the surviving corpus).
  private val cdc57 = GraftQuery(
    "cdc57_knn_erasure",
    (s, dir) => {
      val table = "cdc57_knn"
      graft.streaming.IncrementalKnnGraph.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val embs = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def part(lo: Long, hi: Long) =
        embs.filter(col("vec_id") >= lo && col("vec_id") < hi)
      Seq((0L, 150L, 0L), (150L, 300L, 1L), (150L, 300L, 1L))
        .foreach { case (lo, hi, b) =>
          graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
            part(lo, hi), b)
        }
      val del = embs
        .filter(col("vec_id") >= 8 && col("vec_id") < 300 &&
          col("vec_id") % 5 === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      graft.streaming.IncrementalKnnGraph.deleteVectors(s, table, del)
      // post-delete ingest exercises the repaired thresholds
      graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
        part(300L, Long.MaxValue), 2L)
      graft.streaming.IncrementalKnnGraph.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalKnnGraph.applyBatch(s, table,
        embs.filter(col("vec_id").isin(
          del.filter(_ % 2 == 0): _*)), 3L)
      graft.streaming.IncrementalKnnGraph.graphView(s, table)
        .orderBy(col("vec_id"), col("rnk"))
    },
    Some(s"""
      WITH kept_embs AS (
        SELECT * FROM embeddings
        WHERE NOT (vec_id >= 8 AND vec_id < 300 AND vec_id % 5 = 3
          AND vec_id % 2 <> 0)),
      ${knnGraphCtes(nProbe = 2)
        .replace("FROM embeddings", "FROM kept_embs")}
      SELECT vec_id, nbr_id, rnk, cos FROM g
      WHERE rnk <= 4
      ORDER BY vec_id, rnk"""))

  // -------------------------------------------------------------- cdc58
  // MAINTAINED FRAME NEAR-DUP INDEX (IncrementalFrameDedup) — mm07's
  // frame-fingerprint rung kept current under media ingest,
  // completing the maintained media-dedup ladder next to cdc47's
  // pHash rung. The design point (the containment lesson, applied
  // from day one — the r15 instruction): mm07's df cap is
  // corpus-dependent and DRIFTS, so kept-ness is recomputed at READ
  // time over the visible postings, never frozen at ingest — which
  // also makes erasure a pure ledger append. Serve == one-shot mm07
  // exactly (same oracle), through a REDELIVERED batch, a MID-STREAM
  // bucket compaction, and an ERASE + RE-INSERT cycle that must
  // cancel exactly (the read-time df absorbs both directions).
  private val cdc58 = GraftQuery(
    "cdc58_frame_dedup_view",
    (s, dir) => {
      import s.implicits._
      val table = "cdc58_frames"
      graft.streaming.IncrementalFrameDedup.tables(table)
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val media =
        MultimodalOps.toMediaColumns(t(s, dir, "documents"))
      def part(i: Int) = media.filter(pmod($"doc_id", lit(3)) === i)
      Seq((0, 0L), (1, 1L), (1, 1L)).foreach { case (p, b) =>
        graft.streaming.IncrementalFrameDedup.applyBatch(s, table,
          part(p), batchId = b, nBuckets = 8)
      }
      graft.streaming.IncrementalFrameDedup.compactBuckets(s, table,
        minParts = 2)
      graft.streaming.IncrementalFrameDedup.applyBatch(s, table,
        part(2), batchId = 2L, nBuckets = 8)
      // erase-then-re-insert must cancel exactly against the one-shot
      // (the read-time df recount in both directions)
      val cyc = media.filter(pmod($"doc_id", lit(11)) === 5)
      graft.streaming.IncrementalFrameDedup.deleteDocs(s, table,
        cyc.select("doc_id"))
      graft.streaming.IncrementalFrameDedup.applyBatch(s, table,
        cyc, batchId = 3L, nBuckets = 8)
      graft.streaming.IncrementalFrameDedup.report(s, table)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(frameNearDupOracle))

  val all: Seq[GraftQuery] =
    Seq(doc37, cdc30, q59, emb28, cdc31, q60, mm06, q61, cdc32,
      doc38, doc39, cdc33, cdc34, mm07, emb29, emb30, emb31, emb32,
      emb33, emb34, doc40, doc41, doc42, cdc35, emb35, emb36,
      emb37, emb38, q62, cdc36, doc43, emb39, cdc37, emb40, emb41,
      q63, cdc38, emb42, q64, emb43, cdc39, emb44, emb45, doc45,
      doc46, doc47, doc48, doc49, cdc40, doc50, cdc41, cdc42, cdc43,
      cdc44, cdc45, cdc46, cdc47, doc51, cdc48, cdc49, cdc50, cdc51,
      cdc52, cdc53, cdc54, cdc55, cdc56, cdc57, cdc58, cdc59, cdc60,
      cdc61)
}
