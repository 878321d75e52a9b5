package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Round-7 data-selection / retrieval queries: sketch calibration
  * (MinHash estimate vs exact Jaccard, semantic-dedup threshold
  * sweep), n-gram novelty scoring, prefix-dimension adaptive
  * retrieval, and modality-aware batch assembly. All-integer hashed
  * outputs wherever a ratio appears (truncating ppm divisions — the
  * doc23 determinism doctrine); the cosine queries reuse the
  * fixed-association double chains the emb01–15 oracles pin.
  */
object SelectionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  import LlmQueries.{bigramShCtes, bucketSql, dotSql, minhashLshPairsCtes, normSql}

  // -------------------------------------------------------------- doc28
  // n-gram novelty: the share of a doc's distinct bigram shingles that
  // occur in no other document — the data-selection signal rewarding
  // content the corpus doesn't already have. Exact integers end to
  // end; ratio ships as truncating ppm.
  private val doc28 = GraftQuery(
    "doc28_ngram_novelty",
    (s, dir) => {
      import s.implicits._
      CurationOps.ngramNovelty(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $bigramShCtes,
      dfq AS (
        SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
      a AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
          CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel
        FROM sh JOIN dfq USING (shingle) GROUP BY doc_id)
      SELECT doc_id, n_shingles, n_novel,
        CAST((CAST(n_novel AS HUGEINT) * 1000000) // n_shingles
          AS BIGINT) AS novelty_ppm
      FROM a ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc29
  // MinHash sketch-accuracy audit: per LSH candidate pair, the
  // signature-match estimate (match_k/8) against the exact shingle
  // Jaccard, both as truncating ppm plus the absolute error — the
  // calibration that justifies trusting the sketch where exact
  // verification is the cost being avoided. The oracle replays the
  // full FastMix signature pipeline and re-derives both ratios.
  private val doc29 = GraftQuery(
    "doc29_minhash_accuracy",
    (s, dir) => {
      import s.implicits._
      DedupOps.minhashAccuracy(t(s, dir, "documents"))
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minhashLshPairsCtes(bigramShCtes, minJ = 0.0) + s""",
      mk AS (
        SELECT c.doc_a, c.doc_b,
          CAST(${(0 until 8).map(i =>
            s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
            .mkString(" + ")} AS BIGINT) AS match_k
        FROM cands c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b),
      audit AS (
        SELECT p.doc_a, p.doc_b, mk.match_k, p.n_inter,
          CAST(na.n + nb.n - p.n_inter AS BIGINT) AS n_union,
          CAST((mk.match_k * 1000000) // 8 AS BIGINT) AS est_ppm,
          CAST((CAST(p.n_inter AS HUGEINT) * 1000000)
            // (na.n + nb.n - p.n_inter) AS BIGINT) AS true_ppm
        FROM pairs p
        JOIN mk ON mk.doc_a = p.doc_a AND mk.doc_b = p.doc_b
        JOIN sizes na ON na.doc_id = p.doc_a
        JOIN sizes nb ON nb.doc_id = p.doc_b)
      SELECT doc_a, doc_b, match_k, n_inter, n_union, est_ppm,
        true_ppm, CAST(abs(est_ppm - true_ppm) AS BIGINT) AS err_ppm
      FROM audit ORDER BY doc_a, doc_b"""))

  // -------------------------------------------------------------- emb16
  // Prefix-dimension adaptive retrieval (the Matryoshka pattern):
  // 16-dim cosine shortlists 20 candidates/query, full 64-dim exact
  // re-rank keeps 5. The oracle replays both stages with the same
  // fixed-association dot chains over the sliced index range.
  private val emb16 = GraftQuery(
    "emb16_prefix_rerank",
    (s, dir) =>
      SimilarityOps.prefixRerankTopK(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(s"""
      WITH base AS (
        SELECT vec_id, embedding,
          ${normSql("embedding", 16)} AS p_norm,
          ${normSql("embedding", 64)} AS e_norm
        FROM embeddings),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb,
          p_norm AS qp_norm, e_norm AS qe_norm
        FROM base WHERE vec_id < 8),
      pre AS (
        SELECT q.query_id, b.vec_id, b.embedding, b.e_norm,
          q.q_emb, q.qe_norm,
          (${dotSql("q.q_emb", "b.embedding", 16)})
            / (q.qp_norm * b.p_norm) AS p_cos
        FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id),
      sl AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY p_cos DESC, vec_id) AS prn
        FROM pre),
      rr AS (
        SELECT query_id, vec_id,
          (${dotSql("q_emb", "embedding", 64)})
            / (qe_norm * e_norm) AS cos
        FROM sl WHERE prn <= 20),
      ranked AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM rr)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb17
  // Semantic-dedup threshold calibration: near-dup pair count and
  // would-drop doc count at a permille threshold ladder, from ONE
  // bucketed pair pass at the ladder floor. Integer thresholds and
  // counts; the cosine itself never enters the hashed output.
  private val emb17 = GraftQuery(
    "emb17_threshold_curve",
    (s, dir) =>
      SimilarityOps.thresholdCurve(t(s, dir, "embeddings"))
        .orderBy(col("thr_permille")),
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding,
          ${bucketSql("embedding", 64, 6)} AS bucket,
          ${normSql("embedding", 64)} AS e_norm
        FROM embeddings),
      p AS (
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
          (${dotSql("a.embedding", "c.embedding", 64)})
            / (a.e_norm * c.e_norm) AS cos
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE (${dotSql("a.embedding", "c.embedding", 64)})
            / (a.e_norm * c.e_norm) >= 0.3),
      t AS (
        SELECT CAST(unnest([300, 350, 400, 500]) AS BIGINT)
          AS thr_permille)
      SELECT t.thr_permille, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT p.id_b) AS BIGINT) AS n_dropped_docs
      FROM t JOIN p
        ON p.cos >= CAST(t.thr_permille AS DOUBLE) / 1000.0
      GROUP BY t.thr_permille
      ORDER BY thr_permille"""))

  // -------------------------------------------------------------- mm05
  // Modality-aware batch assembly: the mm04 chunk plan streams into
  // byte-budgeted training batches with a PER-MODALITY budget
  // (text 1 KiB, image 4 KiB, audio 2 KiB here), reported per
  // (modality, batch). Pure integer window arithmetic.
  private val mm05 = GraftQuery(
    "mm05_batch_assembly",
    (s, dir) => {
      import s.implicits._
      val chunks = MultimodalOps.chunkPlan(
          MultimodalOps.toMediaColumns(t(s, dir, "documents")),
          chunkBytes = 128, overlapBytes = 32)
        .withColumn("modality",
          expr("CASE pmod(doc_id, 3) WHEN 0 THEN 'text' " +
            "WHEN 1 THEN 'image' ELSE 'audio' END"))
      MultimodalOps.batchAssembly(chunks,
          Map("text" -> 1024L, "image" -> 4096L, "audio" -> 2048L))
        .groupBy($"modality", $"batch_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum($"byte_len").as("batch_bytes"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"modality", $"batch_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents),
      c AS (
        SELECT doc_id, n,
          GREATEST(1, (GREATEST(n - 32, 0) + 95) // 96) AS n_chunks
        FROM m),
      e AS (
        SELECT doc_id, n, n_chunks,
          unnest(range(0, n_chunks)) AS chunk_id
        FROM c),
      ch AS (
        SELECT doc_id, chunk_id,
          LEAST(128, n - chunk_id * 96) AS byte_len,
          CASE doc_id % 3 WHEN 0 THEN 'text'
            WHEN 1 THEN 'image' ELSE 'audio' END AS modality
        FROM e),
      budgeted AS (
        SELECT *, CASE modality WHEN 'text' THEN 1024
          WHEN 'image' THEN 4096 ELSE 2048 END AS budget,
          SUM(byte_len) OVER (PARTITION BY modality
            ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING)
            AS cum
        FROM ch),
      assigned AS (
        SELECT *, CAST(GREATEST(cum - 1, 0) // budget AS BIGINT)
          AS batch_id
        FROM budgeted)
      SELECT modality, batch_id, COUNT(*) AS n_chunks,
        CAST(SUM(byte_len) AS BIGINT) AS batch_bytes,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM assigned GROUP BY modality, batch_id
      ORDER BY modality, batch_id"""))

  // -------------------------------------------------------------- emb18
  // ANN recall@5 acceptance report: per query, how many of the exact
  // cosine top-5 the LSH path recovered — the rollout metric before
  // trading exactness for candidate pruning. Integer hits and
  // truncating-ppm recall; the oracle replays BOTH rankings.
  private val emb18 = GraftQuery(
    "emb18_ann_recall",
    (s, dir) =>
      SimilarityOps.recallAtK(t(s, dir, "embeddings"))
        .orderBy(col("query_id")),
    Some(s"""
      WITH base AS (
        SELECT vec_id, embedding,
          ${normSql("embedding", 64)} AS e_norm,
          ${bucketSql("embedding", 64, 6)} AS bucket
        FROM embeddings),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb,
          e_norm AS q_norm, bucket
        FROM base WHERE vec_id < 8),
      ex AS (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        FROM (
          SELECT q.query_id, b.vec_id,
            (${dotSql("q.q_emb", "b.embedding", 64)})
              / (q.q_norm * b.e_norm) AS cos
          FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id)),
      exk AS (SELECT query_id, vec_id FROM ex WHERE rnk <= 5),
      an AS (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        FROM (
          SELECT q.query_id, b.vec_id,
            (${dotSql("q.q_emb", "b.embedding", 64)})
              / (q.q_norm * b.e_norm) AS cos
          FROM base b JOIN q
            ON b.bucket = q.bucket AND b.vec_id <> q.query_id)),
      ank AS (SELECT query_id, vec_id FROM an WHERE rnk <= 5),
      h AS (
        SELECT e.query_id, COUNT(a.vec_id) AS n_hits
        FROM exk e LEFT JOIN ank a
          ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        GROUP BY e.query_id)
      SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
        CAST((n_hits * 1000000) // 5 AS BIGINT) AS recall_ppm
      FROM h ORDER BY query_id"""))

  // -------------------------------------------------------------- q56
  // Nearest-event join (two-sided as-of): each event matches its
  // user's closest order-day aggregate in EITHER time direction, ties
  // to the backward match — one keyed sort + two frame aggregates,
  // never a non-equi join. The oracle states the semantics directly
  // as a per-row lateral minimum over exact epoch-microsecond
  // distances (same tie-break), which DuckDB can afford at sf0.01.
  private val q56 = GraftQuery(
    "q56_nearest_join",
    (s, dir) => {
      import s.implicits._
      val events = t(s, dir, "events")
      val daily = t(s, dir, "orders")
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(count(lit(1)).as("n_orders"))
      TemporalOps.nearestJoin(
        events.select($"event_id", $"user_id", $"ts"),
        daily, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderdate", "n_orders"))
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_time"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("nearest_day"),
          $"n_orders", $"gap_us")
        .orderBy($"event_id")
    },
    Some("""
      WITH daily AS (
        SELECT o_custkey, o_orderdate, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
        strftime(n.o_orderdate, '%Y-%m-%d') AS nearest_day,
        n.n_orders,
        epoch_us(e.ts) - epoch_us(CAST(n.o_orderdate AS TIMESTAMP))
          AS gap_us
      FROM events e
      LEFT JOIN LATERAL (
        SELECT d.o_orderdate, d.n_orders
        FROM daily d WHERE d.o_custkey = e.user_id
        ORDER BY abs(epoch_us(e.ts)
          - epoch_us(CAST(d.o_orderdate AS TIMESTAMP))), d.o_orderdate
        LIMIT 1) n ON TRUE
      ORDER BY e.event_id"""))

  // -------------------------------------------------------------- cdc26
  // Incrementally-maintained JOIN view (IncrementalJoin): latest
  // purchase ⋈ latest click per user, maintained from 3 change
  // batches per side plus an OUT-OF-ORDER redelivery of batch 1 —
  // must equal the one-shot join of the two latest-state windows,
  // which is exactly what the oracle states. Per-batch cost is dirty
  // keys + touched partitions, never table size.
  private val cdc26 = GraftQuery(
    "cdc26_join_view",
    (s, dir) => {
      import s.implicits._
      val (lt, rt, vt) = ("cdc26_purch", "cdc26_click", "cdc26_view")
      Seq(lt, rt, vt, s"${lt}_stage", s"${rt}_stage", s"${vt}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events")
      val purch = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_type".as("p_op"),
          $"event_id".as("p_event_id"), $"ts".as("p_ts"),
          $"value".as("p_value"))
      val click = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_type".as("c_op"),
          $"event_id".as("c_event_id"), $"ts".as("c_ts"))
      def pb(i: Int) = purch.filter(pmod($"p_event_id", lit(3)) === i)
      def cb(i: Int) = click.filter(pmod($"c_event_id", lit(3)) === i)
      Seq(0, 1, 2, 1).foreach { i =>
        graft.streaming.IncrementalJoin.applyBatch(s, lt, rt, vt,
          Some(pb(i)), Some(cb(i)), "user_id",
          Seq("p_ts", "p_event_id"), Seq("c_ts", "c_event_id"),
          nBuckets = 8, leftOpCol = "p_op", rightOpCol = "c_op")
      }
      graft.streaming.IncrementalJoin.readView(s, vt)
        .select($"user_id", $"p_event_id",
          date_format($"p_ts", "yyyy-MM-dd HH:mm:ss").as("p_time"),
          $"p_value", $"c_event_id",
          date_format($"c_ts", "yyyy-MM-dd HH:mm:ss").as("c_time"))
        .orderBy($"user_id")
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id, ts, value, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, event_id, ts, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'click')
      SELECT p.user_id, p.event_id AS p_event_id,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_time,
        p.value AS p_value,
        c.event_id AS c_event_id,
        strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_time
      FROM p JOIN c
        ON p.user_id = c.user_id AND p.rn = 1 AND c.rn = 1
      ORDER BY p.user_id"""))

  // -------------------------------------------------------------- cdc27
  // Incrementally-maintained NEAREST-join view (IncrementalNearestJoin
  // — q56's streaming sibling): each purchase event enriched with its
  // user's closest order-day aggregate in either direction, maintained
  // from 3 change batches per side plus an OUT-OF-ORDER redelivery of
  // batch 1 — must equal the one-shot q56-shape join over all events,
  // which is exactly what the oracle states (per-row lateral minimum
  // over exact epoch-microsecond distances, ties backward). Per-batch
  // cost is dirty keys' group sizes + touched partitions, never table
  // size; a new order can FLIP the match of an untouched event, which
  // is why invalidation is per join key, not per changed row.
  private val cdc27 = GraftQuery(
    "cdc27_nearest_view",
    (s, dir) => {
      import s.implicits._
      val (lt, rt, vt) = ("cdc27_ev", "cdc27_ord", "cdc27_view")
      Seq(lt, rt, vt, s"${lt}_stage", s"${rt}_stage", s"${vt}_stage")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val ev = t(s, dir, "events").filter($"event_type" === "purchase")
        .select($"user_id", $"event_type".as("e_op"), $"event_id",
          $"ts")
      val ord = t(s, dir, "orders")
        .select($"o_custkey".as("user_id"), lit("Insert").as("o_op"),
          $"o_orderkey", $"o_orderdate")
      def eb(i: Int) = ev.filter(pmod($"event_id", lit(3)) === i)
      def ob(i: Int) = ord.filter(pmod($"o_orderkey", lit(3)) === i)
      Seq(0, 1, 2, 1).foreach { i =>
        graft.streaming.IncrementalNearestJoin.applyBatch(s, lt, rt,
          vt, Some(eb(i)), Some(ob(i)), "user_id", "event_id",
          "o_orderkey", Seq("ts", "event_id"),
          Seq("o_orderdate", "o_orderkey"), "ts", "o_orderdate",
          Seq("o_orderdate", "n_orders"),
          rightPrep = r => r.groupBy($"user_id", $"o_orderdate")
            .agg(count(lit(1)).as("n_orders")),
          nBuckets = 8, leftOpCol = "e_op", rightOpCol = "o_op")
      }
      graft.streaming.IncrementalNearestJoin.readView(s, vt)
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_time"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("nearest_day"),
          $"n_orders", $"gap_us")
        .orderBy($"event_id")
    },
    Some("""
      WITH daily AS (
        SELECT o_custkey, o_orderdate, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
        strftime(n.o_orderdate, '%Y-%m-%d') AS nearest_day,
        n.n_orders,
        epoch_us(e.ts) - epoch_us(CAST(n.o_orderdate AS TIMESTAMP))
          AS gap_us
      FROM events e
      LEFT JOIN LATERAL (
        SELECT d.o_orderdate, d.n_orders
        FROM daily d WHERE d.o_custkey = e.user_id
        ORDER BY abs(epoch_us(e.ts)
          - epoch_us(CAST(d.o_orderdate AS TIMESTAMP))), d.o_orderdate
        LIMIT 1) n ON TRUE
      WHERE e.event_type = 'purchase'
      ORDER BY e.event_id"""))

  // -------------------------------------------------------------- emb19
  // Binary (sign) quantization retrieval: 64 sign bits packed into two
  // 32-bit words, Hamming-distance shortlist (bit_count(xor) — the
  // 16-bytes-per-vector storage tier below int8/PQ), exact cosine
  // re-rank keeps 5. Packing is a SUM of distinct powers of two per
  // 32-bit half so the identical arithmetic runs on engines where
  // 1 << 63 overflows. Ties on Hamming break by vec_id.
  private val emb19 = {
    def signSql(lo: Int, hi: Int): String =
      s"""CAST(list_sum(list_transform(range($lo, $hi), i ->
         CASE WHEN embedding[i+1] > 0
           THEN (CAST(1 AS BIGINT) << (i - $lo))
           ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""
    GraftQuery(
      "emb19_binary_hamming",
      (s, dir) =>
        SimilarityOps.binaryHammingRerank(t(s, dir, "embeddings"))
          .orderBy(col("query_id"), col("rnk")),
      Some(s"""
        WITH base AS (
          SELECT vec_id, embedding,
            ${normSql("embedding", 64)} AS e_norm,
            ${signSql(0, 32)} AS sig_lo,
            ${signSql(32, 64)} AS sig_hi
          FROM embeddings),
        q AS (
          SELECT vec_id AS query_id, embedding AS q_emb,
            e_norm AS q_norm, sig_lo AS q_lo, sig_hi AS q_hi
          FROM base WHERE vec_id < 8),
        h AS (
          SELECT q.query_id, b.vec_id, b.embedding, b.e_norm,
            q.q_emb, q.q_norm,
            CAST(bit_count(xor(b.sig_lo, q.q_lo))
              + bit_count(xor(b.sig_hi, q.q_hi)) AS BIGINT) AS hamming
          FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id),
        sl AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY hamming, vec_id) AS hrn
          FROM h),
        rr AS (
          SELECT query_id, vec_id, hamming,
            (${dotSql("q_emb", "embedding", 64)})
              / (q_norm * e_norm) AS cos
          FROM sl WHERE hrn <= 20),
        ranked AS (
          SELECT query_id, vec_id, hamming, cos,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
          FROM rr)
        SELECT query_id, vec_id AS neighbor_id, hamming, rnk, cos
        FROM ranked WHERE rnk <= 5
        ORDER BY query_id, rnk"""))
  }

  // -------------------------------------------------------------- doc30
  // DSIR-style importance weighting (hashed n-gram features, target =
  // the src0 slice): per-bucket add-one-smoothed target/corpus
  // affinity ratios, per-doc summed — the classifier-free "select
  // data that looks like the target" signal. All-integer output
  // (truncating ppm divisions); the oracle replays the seed-0 FastMix
  // bucket hash with the same HUGEINT modular arithmetic the doc04
  // signature oracle uses.
  /** doc30's full oracle replay — also the oracle of doc32 (the
    * incrementally-maintained variant's equivalence pin: batched
    * bucket counts + current-ratio weights must equal this one-shot
    * statement exactly). */
  private val dsirOracleSql: String = {
    val U64 = "CAST('18446744073709551616' AS HUGEINT)"
    val U32 = "CAST('4294967296' AS HUGEINT)"
    def mulmod(a: String, c: java.math.BigInteger): String = {
      val hi = c.shiftRight(32)
      val lo = c.and(java.math.BigInteger.valueOf(0xffffffffL))
      s"(((($a) * $lo) % $U64) + (((($a) * $hi) % $U32) * $U32)) % $U64"
    }
    val C1 = new java.math.BigInteger("18397679294719823053")
    val C2 = new java.math.BigInteger("14181476777654086739")
    val p0 = graft.functions.VectorExpressions.SeededMixHash
      .prefixHashUnsigned(0)
    val poly0 =
      s"""list_reduce(list_prepend(CAST('$p0' AS HUGEINT),
         list_transform(range(1, length(shingle) + 1),
           i -> CAST(ascii(substring(shingle, i, 1)) AS HUGEINT))),
         (h, b) -> (h * 31 + b) % $U64)"""
    s"""
        WITH $bigramShCtes,
        vocab AS (SELECT DISTINCT shingle FROM sh),
        b0 AS (SELECT shingle, $poly0 AS u FROM vocab),
        b1 AS (SELECT shingle, xor(u, u >> 33) AS u FROM b0),
        b2 AS (SELECT shingle, ${mulmod("u", C1)} AS u FROM b1),
        b3 AS (SELECT shingle, xor(u, u >> 33) AS u FROM b2),
        b4 AS (SELECT shingle, ${mulmod("u", C2)} AS u FROM b3),
        vb AS (SELECT shingle,
          CAST(xor(u, u >> 33) % 64 AS BIGINT) AS bucket FROM b4),
        f AS (
          SELECT sh.doc_id, vb.bucket, d.source
          FROM sh JOIN vb USING (shingle)
          JOIN documents d ON d.doc_id = sh.doc_id),
        r AS (
          SELECT bucket, COUNT(*) AS corpus_cnt,
            SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
              AS target_cnt
          FROM f GROUP BY bucket),
        ra AS (
          SELECT bucket,
            CAST(((target_cnt + 1) * 1000000) // (corpus_cnt + 64)
              AS BIGINT) AS affinity_ppm
          FROM r),
        w AS (
          SELECT f.doc_id, COUNT(*) AS n_feat,
            SUM(ra.affinity_ppm) AS weight
          FROM f JOIN ra USING (bucket) GROUP BY f.doc_id)
        SELECT doc_id, CAST(n_feat AS BIGINT) AS n_feat,
          CAST(weight AS BIGINT) AS weight,
          CAST(weight // n_feat AS BIGINT) AS weight_per_feat_ppm
        FROM w ORDER BY doc_id"""
  }

  private val doc30 = GraftQuery(
    "doc30_dsir_weights",
    (s, dir) => {
      import s.implicits._
      CurationOps.dsirWeights(t(s, dir, "documents"), "src0")
        .orderBy($"doc_id")
    },
    Some(dsirOracleSql))

  // -------------------------------------------------------------- emb20
  // Farthest-first (maximin) seeding — deterministic k-means++: seed 0
  // is the lowest vec_id, each later seed the vector least similar to
  // the chosen set (minimal max cosine, ties to lowest vec_id). The
  // oracle unrolls the k rounds as CTEs, carrying the running max
  // similarity incrementally (GREATEST of the previous round's smax
  // and one new chain — same doubles, one chain per round instead of
  // re-stating all of them).
  private val emb20 = {
    def chain(b: String, s: String): String =
      s"(${dotSql(s"$b.embedding", s"$s.embedding", 64)}) / ($b.n * $s.n)"
    val k = 8
    val rounds = (1 until k).map { i =>
      val prev = if (i == 1) "base" else s"r${i - 1}"
      val seed = s"s${i - 1}"
      val smax =
        if (i == 1) chain("b", seed)
        else s"GREATEST(b.smax, ${chain("b", seed)})"
      s"""r$i AS (
         SELECT b.vec_id, b.embedding, b.n, $smax AS smax
         FROM $prev b, $seed WHERE b.vec_id <> $seed.vec_id),
       s$i AS (
         SELECT vec_id, embedding, n, smax FROM r$i
         ORDER BY smax ASC, vec_id LIMIT 1)"""
    }.mkString(",\n        ")
    val out = (s"""SELECT CAST(0 AS BIGINT) AS seed_rank, vec_id,
         CAST(NULL AS DOUBLE) AS sim_max FROM s0""" +:
      (1 until k).map(i =>
        s"SELECT $i, vec_id, smax FROM s$i")).mkString("\n        UNION ALL ")
    GraftQuery(
      "emb20_farthest_seeds",
      (s, dir) =>
        CurationOps.farthestFirstSeeds(t(s, dir, "embeddings"))
          .orderBy(col("seed_rank")),
      Some(s"""
        WITH base AS (
          SELECT vec_id, embedding, ${normSql("embedding", 64)} AS n
          FROM embeddings),
        s0 AS (
          SELECT vec_id, embedding, n FROM base
          ORDER BY vec_id LIMIT 1),
        $rounds
        $out
        ORDER BY seed_rank"""))
  }

  // -------------------------------------------------------------- emb21
  // Capacity-bounded balanced assignment: nearest-centroid with a
  // per-cluster quota (70 here) and one deterministic rebalance round
  // — over-quota cells keep their most-similar members, the spill
  // lands on each vector's second choice. The IVF-shard balancing
  // step; all-integer/boolean output.
  private val emb21 = GraftQuery(
    "emb21_balanced_assign",
    (s, dir) =>
      SimilarityOps.balancedAssign(t(s, dir, "embeddings"),
          capacity = 70L)
        .orderBy(col("vec_id")),
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      sim AS (
        SELECT b.vec_id, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
            AS ccos
        FROM base b CROSS JOIN cent c),
      assign AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY ccos DESC, cid) AS rn
        FROM sim),
      fc AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
          ORDER BY ccos DESC, vec_id) AS prio
        FROM assign WHERE rn = 1),
      stay AS (
        SELECT vec_id, cid, FALSE AS moved FROM fc WHERE prio <= 70),
      spilled AS (SELECT vec_id FROM fc WHERE prio > 70),
      second AS (
        SELECT a.vec_id, a.cid, TRUE AS moved
        FROM assign a JOIN spilled USING (vec_id) WHERE a.rn = 2)
      SELECT vec_id, cid, moved FROM (
        SELECT * FROM stay UNION ALL SELECT * FROM second)
      ORDER BY vec_id"""))

  // -------------------------------------------------------------- q57
  // Mergeable distinct-count sketches (DataSketches HLL): per
  // (event_type, day) sketches built in one pass, merged at query
  // time into the per-type distinct-user estimate — THE 100 TB
  // distinct-counting pattern (store partition-grain sketches once,
  // answer any rollup by register-max union, never re-scan raw).
  // HLL union is max-per-register — commutative and associative — so
  // the estimate is deterministic under any partitioning; the oracle
  // pins the exact count and a ±5% band on the estimate (lgK=12
  // standard error ≈ 1.6%), q35-style.
  private val q57 = GraftQuery(
    "q57_hll_union",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val daily = ev
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val est = daily.groupBy($"event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_exact"))
      exact.join(est, Seq("event_type"))
        .select($"event_type", $"n_exact",
          (abs($"est" - $"n_exact") <=
            $"n_exact".cast("double") * 0.05).as("est_in_band"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        TRUE AS est_in_band
      FROM events GROUP BY event_type
      ORDER BY event_type"""))

  // -------------------------------------------------------------- doc31
  // Leakage-safe split: split assignment hashes the near-dup CLUSTER
  // id (doc17's components; singletons keep their own id), so no
  // near-duplicate pair ever straddles train/eval — the doc08 gate
  // with the doc18 closure, preventing the silent eval inflation a
  // per-document split allows.
  private val doc31 = GraftQuery(
    "doc31_leakage_split",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.verifiedNearDups(docs)
        .select($"doc_a", $"doc_b")
      CurationOps.leakageSafeSplit(docs, pairs)
        .select($"doc_id", $"component", $"bucket", $"split")
        .orderBy($"doc_id")
    },
    Some(minhashLshPairsCtes(bigramShCtes, minJ = 0.2,
      recursive = true) + LlmQueries.ccClosureCtes + """,
      lab AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
      g AS (
        SELECT doc_id, component,
          CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 2))
            AS BIGINT) AS bucket
        FROM lab)
      SELECT doc_id, component, bucket,
        CASE WHEN bucket < 204 THEN 'train'
             WHEN bucket < 230 THEN 'val'
             ELSE 'test' END AS split
      FROM g ORDER BY doc_id"""))

  // -------------------------------------------------------------- emb22
  // Per-dimension winsorization bounds: [p05, p95] exact interpolated
  // quantiles of every embedding dimension + would-clip counts — the
  // outlier-robust scaling audit before int8/PQ quantization. Exact
  // percentiles opt into the PercentileOps gate (corpus/dim values
  // per group); the 100 TB path swaps in the GK sketch for bounds.
  private val emb22 = GraftQuery(
    "emb22_dim_winsorize",
    (s, dir) =>
      CurationOps.dimWinsorize(t(s, dir, "embeddings"))
        .orderBy(col("dim")),
    Some("""
      WITH v AS (
        SELECT CAST(i - 1 AS BIGINT) AS dim,
          CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, range(1, 65) t(i)),
      bounds AS (
        SELECT dim, quantile_cont(v, 0.05) AS lo,
          quantile_cont(v, 0.95) AS hi
        FROM v GROUP BY dim)
      SELECT v.dim, ANY_VALUE(b.lo) AS lo, ANY_VALUE(b.hi) AS hi,
        CAST(SUM(CASE WHEN v.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
          AS n_lo,
        CAST(SUM(CASE WHEN v.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hi,
        COUNT(*) AS n
      FROM v JOIN bounds b ON v.dim = b.dim
      GROUP BY v.dim
      ORDER BY v.dim"""))

  // -------------------------------------------------------------- doc32
  // Incrementally-maintained DSIR statistics (IncrementalDsir): the
  // corpus arrives in THREE document-disjoint batches plus a
  // REDELIVERED batch (watermark no-op); weights served against the
  // maintained 64-row bucket table must equal one-shot doc30 —
  // doc30's own oracle IS this query's oracle. Per-ingest cost is one
  // batch-sized shingle scan, never a corpus re-scan.
  private val doc32 = GraftQuery(
    "doc32_incremental_dsir",
    (s, dir) => {
      import s.implicits._
      val table = "doc32_buckets"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      Seq(0, 1, 1, 2).zipWithIndex.foreach { case (p, bid) =>
        // the replayed batch re-sends p=1 under its ORIGINAL id 1
        val id = if (bid == 2) 1L else bid.toLong
        graft.streaming.IncrementalDsir.applyBatch(
          s, table, part(p), "src0", id)
      }
      graft.streaming.IncrementalDsir.weightsFor(s, table, docs)
        .orderBy($"doc_id")
    },
    Some(dsirOracleSql))

  // -------------------------------------------------------------- doc33
  // Curriculum ordering: cleanest quality band first, deterministic
  // md5 shuffle within band, shipped as ONE BIGINT sort key — the
  // training reader materializes the curriculum with a distributed
  // range sort on (sort_key, doc_id), never a global-rank window.
  private val doc33 = GraftQuery(
    "doc33_curriculum_order",
    (s, dir) => {
      import s.implicits._
      CurationOps.curriculumOrder(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id,
          CAST(len(string_split(TRIM(text), ' ')) AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text,
            '\b(the|a|an|of|to|and|in|is|on|for)\b')) AS BIGINT)
            AS n_stopwords
        FROM documents),
      q AS (
        SELECT doc_id,
          LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
            * (1.0 - CAST(n_stopwords AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE)) AS quality
        FROM base),
      b AS (
        SELECT doc_id,
          CAST((CASE WHEN quality >= 0.3 THEN 1 ELSE 0 END)
             + (CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END)
             + (CASE WHEN quality >= 0.8 THEN 1 ELSE 0 END)
            AS BIGINT) AS band,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))
            AS BIGINT) AS shuffle40
        FROM q)
      SELECT doc_id, band, CAST(3 - band AS BIGINT) AS stage,
        (3 - band) * 1099511627776 + shuffle40 AS sort_key
      FROM b ORDER BY doc_id"""))

  // -------------------------------------------------------------- emb23
  // Scalable k-means|| (Bahmani) seeding: a FIXED number of rounds
  // (corpus scans = rounds+1, independent of k — emb20's maximin costs
  // k-1 sequential scans), each sampling ~oversample candidates via
  // the deterministic md5 gate u40·phi < d2i·oversample·2^40 — an
  // EXACT integer inequality (fixed-point squared distances, BIGINT
  // phi), so no float-sum association can flip a borderline keep.
  // Seeds = the k candidates covering the most corpus vectors. The
  // oracle unrolls the rounds as CTEs with the same integer gate.
  private val emb23 = {
    val r = 4; val l = 16; val k = 8
    val gate = l.toLong * (1L << 40)
    val rounds = (1 to r).map { i =>
      val prev = s"c${i - 1}"
      s"""a$i AS (
        SELECT b.vec_id,
          MAX((${dotSql("b.embedding", "c.embedding", 64)}) / (b.n * c.n))
            AS mx
        FROM base b CROSS JOIN (
          SELECT bb.embedding, bb.n FROM base bb
          JOIN $prev cd ON bb.vec_id = cd.vec_id) c
        GROUP BY b.vec_id),
      d$i AS (
        SELECT vec_id,
          CAST(floor((1.0 - mx) * (1.0 - mx) * 1000000000.0) AS BIGINT)
            AS d2i
        FROM a$i),
      p$i AS (SELECT SUM(d2i) AS phi FROM d$i),
      c$i AS (
        SELECT vec_id FROM $prev
        UNION
        SELECT d.vec_id FROM d$i d, p$i
        WHERE CAST(CAST(('0x' ||
            substring(md5(CAST(d.vec_id AS VARCHAR) || ':$i'), 1, 10))
            AS BIGINT) AS HUGEINT) * p$i.phi
          < CAST(d.d2i AS HUGEINT) * $gate)"""
    }.mkString(",\n        ")
    GraftQuery(
      "emb23_kmeanspar_seeds",
      (s, dir) =>
        CurationOps.kmeansParallelSeeds(t(s, dir, "embeddings"),
            k = k, rounds = r, oversample = l)
          .orderBy(col("weight").desc, col("vec_id")),
      Some(s"""
        WITH base AS (
          SELECT vec_id, embedding, ${normSql("embedding", 64)} AS n
          FROM embeddings),
        c0 AS (SELECT vec_id FROM base ORDER BY vec_id LIMIT 1),
        $rounds,
        cemb AS (
          SELECT bb.vec_id AS cid, bb.embedding AS ce, bb.n AS cn
          FROM base bb JOIN c$r cd ON bb.vec_id = cd.vec_id),
        sim AS (
          SELECT b.vec_id, c.cid,
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.n * c.cn) AS ccos
          FROM base b CROSS JOIN cemb c),
        asg AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY ccos DESC, cid) AS rn FROM sim),
        w AS (
          SELECT cid, CAST(COUNT(*) AS BIGINT) AS weight
          FROM asg WHERE rn = 1 GROUP BY cid)
        SELECT vec_id, weight FROM (
          SELECT cid AS vec_id, weight FROM w
          ORDER BY weight DESC, cid LIMIT $k)
        ORDER BY weight DESC, vec_id"""))
  }

  // -------------------------------------------------------------- emb24
  // The 100 TB path of emb22, oracle-PINNED: winsorization bounds from
  // the GK sketch (approx_percentile — bounded memory, no per-group
  // full-value buffer), audited by rank band — the clip count of each
  // sketch bound must sit within ±3 points of the nominal 5% tail.
  // The q35/q57 sketch-banding pattern: the oracle emits TRUE per
  // dimension, so sketch drift (or a silent swap to a value-buffering
  // aggregate path) fails the driver gate.
  private val emb24 = GraftQuery(
    "emb24_winsorize_sketch",
    (s, dir) =>
      CurationOps.dimWinsorizeSketch(t(s, dir, "embeddings"))
        .orderBy(col("dim")),
    Some("""
      WITH v AS (
        SELECT CAST(i - 1 AS BIGINT) AS dim
        FROM embeddings, range(1, 65) t(i))
      SELECT dim, COUNT(*) AS n, TRUE AS lo_in_band, TRUE AS hi_in_band
      FROM v GROUP BY dim
      ORDER BY dim"""))

  // -------------------------------------------------------------- emb25
  // STRICT capacity-bounded assignment: emb21's one rebalance round
  // bounds a cell only at capacity + spill-in; this is synchronous
  // deferred acceptance iterated to the fixed point — every cell ends
  // ≤ capacity, full stop. Capacity is the minimal ceil(n/8) (maximal
  // pressure — the displacement cascades actually run). The oracle
  // replays the SAME synchronous rounds as a recursive CTE carrying
  // the full per-round state (UNION ALL + an advanced-count guard:
  // DuckDB's recursive working table only sees the last iteration, so
  // the state must travel whole).
  private val emb25 = GraftQuery(
    "emb25_balanced_strict",
    (s, dir) => {
      val embs = t(s, dir, "embeddings")
      val n = embs.count()
      SimilarityOps.balancedAssignStrict(embs, capacity = (n + 7) / 8)
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH RECURSIVE cent AS (
        SELECT vec_id AS cid, embedding AS ce,
          ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      cap AS (SELECT CAST((COUNT(*) + 7) // 8 AS BIGINT) AS c FROM base),
      sim AS (
        SELECT b.vec_id, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn) AS ccos
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
        WHERE it = (SELECT MAX(it) FROM st))
      SELECT f.vec_id, a.cid, CAST(f.rnk AS BIGINT) AS rank
      FROM fin f JOIN assign a ON a.vec_id = f.vec_id AND a.rn = f.rnk
      ORDER BY f.vec_id"""))

  // -------------------------------------------------------------- cdc28
  // Incrementally-maintained connected components (IncrementalCC):
  // the doc04 verified pair list arrives in THREE arbitrary batches
  // plus a REDELIVERED batch (watermark no-op); the maintained label
  // table must equal one-shot doc17 — min-label union is associative,
  // so batch order cannot matter, and doc17's own oracle IS this
  // query's oracle. Per-batch cost: a component-graph CC bounded by
  // the batch, PRUNED-bucket reads of the label table and its
  // component→buckets inverted index (scan ∝ touched components,
  // never table size), dirty-bucket upserts.
  private val cdc28 = GraftQuery(
    "cdc28_incremental_cc",
    (s, dir) => {
      import s.implicits._
      val table = "cdc28_labels"
      graft.streaming.IncrementalCC.dropTables(s, table)
      val docs = t(s, dir, "documents")
      // fixture pairs materialized ONCE: the lazy form re-ran the
      // whole LSH+verify pipeline inside EVERY fold's own
      // batch.localCheckpoint (4× the pipeline per run, measured as
      // cdc28's dominant cost in the r16 optimization round). In a
      // real deployment the pair batches ARRIVE on a stream — the
      // fold cost is what the query measures, not the fixture build
      // (the maintainedKnnEdges discipline).
      val pairs = DedupOps.verifiedNearDups(docs)
        .select($"doc_a", $"doc_b")
        .localCheckpoint()
      def part(i: Int) =
        pairs.filter(pmod($"doc_a" * 7 + $"doc_b", lit(3)) === i)
      // the replayed batch re-sends part 1 under its ORIGINAL id 1
      try Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach {
        case (p, id) =>
          graft.streaming.IncrementalCC.applyBatch(s, table, part(p), id)
      } finally {
        // folds done — free the fixture's pinned blocks (they
        // otherwise persist for the whole bench/PlanDump session)
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .freeLocalCheckpoint(pairs)
        ()
      }
      graft.streaming.IncrementalCC.readLabels(s, table)
        .orderBy($"doc_id")
    },
    Some(minhashLshPairsCtes(bigramShCtes, minJ = 0.2,
      recursive = true) + LlmQueries.ccClosureCtes + """
      SELECT doc_id, component FROM comp
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc34
  // Bigram-LM fluency score (the CCNet perplexity-filter shape): the
  // model is the corpus's own bigram table, P(w2|w1) as truncating
  // integer ppm, a doc's score the truncating mean over its bigram
  // occurrences. Float-free end to end (doc23 doctrine).
  private val doc34 = GraftQuery(
    "doc34_bigram_lm",
    (s, dir) => {
      import s.implicits._
      CurationOps.bigramLmScore(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)),
          i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
        FROM toks WHERE len(ws) >= 2),
      bgf AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bgf GROUP BY w1, w2),
      c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
      model AS (SELECT c2.w1, c2.w2,
        CAST((c2.c2 * 1000000) // c1.c1 AS BIGINT) AS p_ppm
        FROM c2 JOIN c1 USING (w1)),
      sc AS (
        SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(m.p_ppm) AS sum_ppm
        FROM bgf b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        GROUP BY b.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(sc.sum_ppm // sc.n_bigrams, 0) AS BIGINT)
          AS avg_ppm
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc35
  // Sliding-window token chunking — RAG / context-window prep: chunks
  // of 64 tokens advancing by 48 (16-token overlap), (doc_id,
  // chunk_idx) the stable key, boundaries a pure function of token
  // count. No shuffle at all: the chunker is partition-local.
  private val doc35 = GraftQuery(
    "doc35_text_chunks",
    (s, dir) => {
      import s.implicits._
      CurationOps.slidingChunks(t(s, dir, "documents"))
        .orderBy($"doc_id", $"chunk_idx")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      base AS (
        SELECT doc_id, ws, len(ws) AS n_tok,
          CASE WHEN len(ws) <= 64 THEN 1
            ELSE 1 + (len(ws) - 64 + 47) // 48 END AS n_chunks
        FROM toks),
      ch AS (
        SELECT doc_id, ws, n_tok,
          unnest(range(0, n_chunks)) AS chunk_idx
        FROM base)
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        CAST(chunk_idx*48 + 1 AS BIGINT) AS start_tok,
        CAST(LEAST(64, n_tok - chunk_idx*48) AS BIGINT) AS chunk_len,
        array_to_string(list_slice(ws, chunk_idx*48 + 1,
          chunk_idx*48 + LEAST(64, n_tok - chunk_idx*48)), ' ')
          AS chunk_text
      FROM ch ORDER BY doc_id, chunk_idx"""))

  // -------------------------------------------------------------- doc36
  // Shingle containment (asymmetric near-superset detection): a doc
  // whose DISCRIMINATIVE (df ≤ 100) word-TRIGRAM shingles are ≥80%
  // contained in another — the quote / syndicated-snippet relation
  // symmetric Jaccard structurally misses. Trigrams, not the MinHash
  // bigram: w-gram vocabulary grows ~|vocab|^w, so a fixed absolute
  // df cap stays discriminative as the corpus grows (bigrams go
  // universally-common at 10× this corpus and recall collapses to
  // zero — measured; rare-LONG-n-gram matching is the published
  // contamination-detection practice). Candidates via the
  // rare-shingle inverted index narrowed by the lossless PPJoin
  // prefix filter (no LSH — low-J containment pairs are the point);
  // integer ppm output.
  private val doc36 = GraftQuery(
    "doc36_containment",
    (s, dir) => {
      import s.implicits._
      DedupOps.containmentPairs(t(s, dir, "documents"))
        .orderBy($"doc_a", $"doc_b")
    },
    Some(SelectionQueries.containmentOracle))

  // Shared with the maintained twin (cdc45, OpsQueries) — identical
  // oracle text for the fold == one-shot claim. A def (order-proof
  // under object init, see LlmQueries.bm25Oracle).
  private[operators] def containmentOracle: String = ("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        FROM toks WHERE len(ws) >= 3),
      dfreq AS (
        SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY shingle
        HAVING COUNT(*) <= 100),
      sh AS (
        SELECT sh0.doc_id, sh0.shingle, dfreq.df
        FROM sh0 JOIN dfreq USING (shingle)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      ranked AS (
        SELECT s.doc_id, s.shingle, z.n,
          ROW_NUMBER() OVER (PARTITION BY s.doc_id
            ORDER BY s.df, s.shingle) AS rnk
        FROM sh s JOIN sz z USING (doc_id)),
      pfx AS (
        SELECT doc_id, shingle FROM ranked
        WHERE rnk <= (200000 * n) // 1000000 + 1),
      cand AS (
        SELECT DISTINCT p.doc_id AS doc_a, s.doc_id AS doc_b
        FROM pfx p JOIN sh s ON s.shingle = p.shingle
          AND s.doc_id <> p.doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter,
        CAST(sa.n AS BIGINT) AS n_a,
        CAST((i.n_inter * 1000000) // sa.n AS BIGINT) AS containment_ppm
      FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
      WHERE sa.n >= 3 AND (i.n_inter * 1000000) // sa.n >= 800000
      ORDER BY doc_a, doc_b""")

  // -------------------------------------------------------------- emb26
  // MMR diversity re-rank: greedy k-of-pool selection maximizing
  // λ·relevance − (1−λ)·max-sim-to-selected — the step between "top-k
  // by cosine" and "what goes in the context window". The oracle
  // unrolls the k greedy rounds as CTEs (the emb20/emb23 doctrine)
  // over the same fixed-association cosine chains.
  private val emb26 = {
    val nQ = 8; val poolSize = 12; val k = 4
    val lam = "700000.0"; val mu = "300000.0"
    val rounds = (1 to k).map { r =>
      val prev = s"sel${r - 1}"
      s"""
      sc$r AS (
        SELECT p.query_id, p.neighbor_id, p.rel,
          COALESCE(m.red, 0.0) AS red
        FROM pool p
        LEFT JOIN $prev s ON s.query_id = p.query_id
          AND s.neighbor_id = p.neighbor_id
        LEFT JOIN (
          SELECT ps.query_id, ps.a, MAX(ps.cs) AS red
          FROM pairsims ps JOIN $prev sb
            ON sb.query_id = ps.query_id AND sb.neighbor_id = ps.b
          GROUP BY ps.query_id, ps.a) m
          ON m.query_id = p.query_id AND m.a = p.neighbor_id
        WHERE s.neighbor_id IS NULL),
      pk$r AS (
        SELECT query_id, neighbor_id, rel,
          $lam * rel - $mu * red AS score_x1m,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY $lam * rel - $mu * red DESC, neighbor_id) AS rn
        FROM sc$r),
      sel$r AS (
        SELECT query_id, neighbor_id, sel_rank, rel, score_x1m
        FROM $prev
        UNION ALL
        SELECT query_id, neighbor_id, CAST($r AS BIGINT) AS sel_rank,
          rel, score_x1m
        FROM pk$r WHERE rn = 1)"""
    }.mkString(",")
    GraftQuery(
      "emb26_mmr_rerank",
      (s, dir) =>
        SimilarityOps.mmrRerank(t(s, dir, "embeddings"),
            nQueries = nQ, poolSize = poolSize, k = k)
          .orderBy(col("query_id"), col("sel_rank")),
      Some(s"""
        WITH c AS (
          SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
          FROM embeddings),
        q AS (
          SELECT vec_id AS query_id, embedding AS q_emb, en AS qn
          FROM c WHERE vec_id < $nQ),
        scored AS (
          SELECT q.query_id, c.vec_id,
            (${dotSql("q_emb", "embedding", 64)}) / (q.qn * c.en) AS rel
          FROM c JOIN q ON c.vec_id <> q.query_id),
        pool AS (
          SELECT query_id, vec_id AS neighbor_id, rel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rel DESC, vec_id) AS rnk
            FROM scored) WHERE rnk <= $poolSize),
        pairsims AS (
          SELECT pa.query_id, pa.neighbor_id AS a, pb.neighbor_id AS b,
            (${dotSql("ea.embedding", "eb.embedding", 64)})
              / (ea.en * eb.en) AS cs
          FROM pool pa
          JOIN pool pb ON pa.query_id = pb.query_id
            AND pa.neighbor_id <> pb.neighbor_id
          JOIN c ea ON ea.vec_id = pa.neighbor_id
          JOIN c eb ON eb.vec_id = pb.neighbor_id),
        sel0 AS (
          SELECT CAST(NULL AS BIGINT) AS query_id,
            CAST(NULL AS BIGINT) AS neighbor_id,
            CAST(NULL AS BIGINT) AS sel_rank,
            CAST(NULL AS DOUBLE) AS rel,
            CAST(NULL AS DOUBLE) AS score_x1m
          WHERE FALSE),
        $rounds
        SELECT query_id, neighbor_id, sel_rank, rel, score_x1m
        FROM sel$k ORDER BY query_id, sel_rank"""))
  }

  // -------------------------------------------------------------- q58
  // KMV/theta sketch set algebra: per-segment k-minimum-values
  // sketches of the distinct user sets, then SEGMENT-OVERLAP
  // estimates from the sketches alone — the set-intersection
  // capability HLL union (q57) cannot give. Exact counts ride in the
  // same row, so the artifact self-audits; the oracle replays the
  // integer sketch arithmetic EXACTLY (no band needed — k smallest
  // md5-40 hashes are a pure set function).
  private val q58 = {
    val k = 64
    val segs = Seq("click", "purchase", "view")
    GraftQuery(
      "q58_kmv_intersect",
      (s, dir) => {
        import s.implicits._
        val u = t(s, dir, "events")
          .filter($"event_type".isin(segs: _*))
          .select($"event_type".as("seg"), $"user_id".as("v"))
          .distinct()
        val all = segs.map { g =>
          SketchOps.kmvSketch(u.filter($"seg" === g), "v", k)
            .withColumn("seg", lit(g))
        }.reduce(_ unionByName _).localCheckpoint()
        SketchOps.overlapReport(all, u, k).orderBy($"seg_a", $"seg_b")
      },
      Some(s"""
        WITH u AS (
          SELECT DISTINCT event_type, user_id FROM events
          WHERE event_type IN ('click', 'purchase', 'view')),
        hd AS (
          SELECT DISTINCT event_type,
            CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 10)
              AS BIGINT) AS h
          FROM u),
        rk AS (
          SELECT event_type, h, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY h) AS r
          FROM hd),
        sk AS (SELECT event_type AS seg, h FROM rk WHERE r <= $k),
        st AS (
          SELECT seg, CASE WHEN COUNT(*) < $k
              THEN ${SketchOps.Theta40}
              ELSE MAX(h) END AS theta
          FROM sk GROUP BY seg),
        cnt AS (
          SELECT sk.seg, COUNT(*) AS c
          FROM sk JOIN st USING (seg) WHERE sk.h < st.theta
          GROUP BY sk.seg),
        est AS (
          SELECT st.seg,
            (COALESCE(cnt.c, 0) * ${SketchOps.Theta40}) // st.theta
              AS est
          FROM st LEFT JOIN cnt USING (seg)),
        pairs(seg_a, seg_b) AS (VALUES
          ('click', 'purchase'), ('click', 'view'),
          ('purchase', 'view')),
        com AS (
          SELECT x.seg AS seg_a, y.seg AS seg_b, COUNT(*) AS cc
          FROM sk x JOIN sk y ON x.h = y.h AND x.seg < y.seg
          JOIN st sa ON sa.seg = x.seg
          JOIN st sb ON sb.seg = y.seg
          WHERE x.h < LEAST(sa.theta, sb.theta)
          GROUP BY 1, 2),
        exi AS (
          SELECT p.event_type AS seg_a, q.event_type AS seg_b,
            COUNT(*) AS exact_inter
          FROM u p JOIN u q ON p.user_id = q.user_id
            AND p.event_type < q.event_type
          GROUP BY 1, 2),
        exs AS (
          SELECT event_type AS seg, COUNT(*) AS exact
          FROM u GROUP BY event_type)
        SELECT p.seg_a, p.seg_b, ea.est AS est_a, eb.est AS est_b,
          (COALESCE(com.cc, 0) * ${SketchOps.Theta40})
            // LEAST(sa.theta, sb.theta) AS est_inter,
          CAST(xa.exact AS BIGINT) AS exact_a,
          CAST(xb.exact AS BIGINT) AS exact_b,
          CAST(COALESCE(exi.exact_inter, 0) AS BIGINT) AS exact_inter
        FROM pairs p
        JOIN st sa ON sa.seg = p.seg_a
        JOIN st sb ON sb.seg = p.seg_b
        JOIN est ea ON ea.seg = p.seg_a
        JOIN est eb ON eb.seg = p.seg_b
        JOIN exs xa ON xa.seg = p.seg_a
        JOIN exs xb ON xb.seg = p.seg_b
        LEFT JOIN com ON com.seg_a = p.seg_a AND com.seg_b = p.seg_b
        LEFT JOIN exi ON exi.seg_a = p.seg_a AND exi.seg_b = p.seg_b
        ORDER BY p.seg_a, p.seg_b"""))
  }

  // -------------------------------------------------------------- cdc29
  // Incremental semantic dedup: emb27's decisions maintained under
  // batched ingest (arrival-order contract — a kept representative is
  // never evicted; a batch member is dup iff τ-close to an earlier
  // kept rep in its cell OR to a better-ranked member of its own
  // batch). Frozen centroids = first 8 vectors of batch 0; the kept
  // reps of a cell are pairwise > τ apart, so rep state saturates at
  // the τ-packing number — geometry-bounded, not corpus-bounded. The
  // oracle unrolls the three batches (and the replay, which must
  // append nothing) as CTEs.
  private val cdc29 = {
    val dotAB = dotSql("a.embedding", "x.embedding", 64)
    val ppmAB = s"CAST(FLOOR(($dotAB) / (a.en * x.en) * 1000000) AS BIGINT)"
    def round(i: Int): String = s"""
      r$i AS MATERIALIZED (
        SELECT vec_id, embedding, en, cid, ccos,
          ROW_NUMBER() OVER (PARTITION BY cid
            ORDER BY ccos DESC, vec_id) AS crnk
        FROM mem WHERE b = $i),
      pa$i AS (
        SELECT a.cid, a.vec_id, $ppmAB AS p
        FROM r$i a JOIN k${i - 1} x ON x.cid = a.cid),
      pb$i AS (
        SELECT a.cid, a.vec_id, $ppmAB AS p
        FROM r$i a JOIN r$i x ON x.cid = a.cid AND x.crnk < a.crnk),
      p$i AS (
        SELECT cid, vec_id, MAX(p) AS bp FROM (
          SELECT * FROM pa$i UNION ALL SELECT * FROM pb$i)
        GROUP BY cid, vec_id),
      d$i AS MATERIALIZED (
        SELECT r.vec_id, r.cid, r.embedding, r.en,
          COALESCE(bp, -1000000) AS bkp,
          COALESCE(bp, -1000000) >= 350000 AS is_dup,
          CAST($i AS BIGINT) AS batch
        FROM r$i r LEFT JOIN p$i
          ON p$i.cid = r.cid AND p$i.vec_id = r.vec_id),
      k$i AS MATERIALIZED (
        SELECT cid, embedding, en FROM k${i - 1}
        UNION ALL
        SELECT cid, embedding, en FROM d$i WHERE NOT is_dup)"""
    GraftQuery(
      "cdc29_incremental_semdedup",
      (s, dir) => {
        import s.implicits._
        val table = "cdc29_semdedup"
        Seq(table, s"${table}_centroids")
          .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
        val embs = t(s, dir, "embeddings")
        def part(i: Int) = embs.filter(pmod($"vec_id", lit(3)) === i)
        // batch 1 is re-delivered under its original id — must no-op
        Seq((0, 0L), (1, 1L), (1, 1L), (2, 2L)).foreach { case (p, id) =>
          graft.streaming.IncrementalSemDedup.applyBatch(
            s, table, part(p), id)
        }
        graft.streaming.IncrementalSemDedup.readDecisions(s, table)
          .select($"vec_id", $"cid", $"best_kept_ppm", $"is_dup",
            $"_batch".as("batch"))
          .orderBy($"vec_id")
      },
      Some(s"""
        WITH base AS (
          SELECT vec_id, embedding,
            ${normSql("embedding", 64)} AS en,
            vec_id % 3 AS b
          FROM embeddings),
        cent AS (
          SELECT vec_id AS cid, embedding AS ce, en AS cn
          FROM base WHERE b = 0 ORDER BY vec_id LIMIT 8),
        assign AS (
          SELECT v.vec_id, v.embedding, v.en, v.b, c.cid,
            (${dotSql("v.embedding", "c.ce", 64)}) / (v.en * c.cn)
              AS ccos,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
              (${dotSql("v.embedding", "c.ce", 64)}) / (v.en * c.cn)
                DESC, c.cid) AS rn
          FROM base v CROSS JOIN cent c),
        mem AS MATERIALIZED (
          SELECT vec_id, embedding, en, b, cid, ccos
          FROM assign WHERE rn = 1),
        r0 AS MATERIALIZED (
          SELECT vec_id, embedding, en, cid, ccos,
            ROW_NUMBER() OVER (PARTITION BY cid
              ORDER BY ccos DESC, vec_id) AS crnk
          FROM mem WHERE b = 0),
        p0 AS (
          SELECT a.cid, a.vec_id, MAX($ppmAB) AS bp
          FROM r0 a JOIN r0 x ON x.cid = a.cid AND x.crnk < a.crnk
          GROUP BY a.cid, a.vec_id),
        d0 AS MATERIALIZED (
          SELECT r.vec_id, r.cid, r.embedding, r.en,
            COALESCE(bp, -1000000) AS bkp,
            COALESCE(bp, -1000000) >= 350000 AS is_dup,
            CAST(0 AS BIGINT) AS batch
          FROM r0 r LEFT JOIN p0
            ON p0.cid = r.cid AND p0.vec_id = r.vec_id),
        k0 AS MATERIALIZED (SELECT cid, embedding, en FROM d0 WHERE NOT is_dup),
        ${round(1)},
        ${round(2)}
        SELECT vec_id, cid, bkp AS best_kept_ppm, is_dup, batch FROM (
          SELECT * FROM d0 UNION ALL
          SELECT * FROM d1 UNION ALL
          SELECT * FROM d2)
        ORDER BY vec_id"""))
  }

  // -------------------------------------------------------------- emb27
  // SemDeDup-style semantic dedup: within each centroid cell, a
  // member is a duplicate when its cosine to a strictly BETTER-ranked
  // member (centroid-cosine desc) reaches τ=0.35 — paraphrase-level
  // near-dups that lexical MinHash/SimHash cannot see. The cell
  // equi-join bounds the pairwise pass at cell size (the published
  // SemDeDup recipe, because corpus all-pairs is impossible); the
  // kept representative is the centroid-closest member; decisions on
  // truncating integer ppm (floor of bit-identical doubles).
  private val emb27 = GraftQuery(
    "emb27_semantic_dedup",
    (s, dir) =>
      SimilarityOps.semanticDedup(t(s, dir, "embeddings"))
        .orderBy(col("vec_id")),
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
            AS ccos,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn)
              DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      mem AS (
        SELECT vec_id, embedding, en, cid, ccos
        FROM assign WHERE rn = 1),
      ranked AS (
        SELECT vec_id, embedding, en, cid, ccos,
          CAST(ROW_NUMBER() OVER (PARTITION BY cid
            ORDER BY ccos DESC, vec_id) AS BIGINT) AS crnk
        FROM mem),
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

  val all: Seq[GraftQuery] =
    Seq(doc28, doc29, emb16, emb17, emb18, mm05, q56, cdc26, cdc27,
      emb19, doc30, emb20, emb21, q57, doc31, emb22, doc32, doc33,
      emb23, emb24, emb25, cdc28, doc34, doc35, doc36, emb26, q58,
      emb27, cdc29)
}

