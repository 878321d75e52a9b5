package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Oracle-checked queries over the training-corpus curation surface
  * ([[CurationOps]]): sequence packing, benchmark decontamination,
  * corpus clustering. Oracles restate each stage independently in
  * DuckDB SQL (shingle construction and vector math reuse the proven
  * formulations from [[LlmQueries]]).
  */
object TrainingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -------------------------------------------------------------- doc12
  // Sequence packing: docs → per-shard cumulative token-budget bins
  // (budget 512, 8 shards), reported at bin granularity. Scale: the
  // running sum is partitioned by shard (the parallelism knob); the
  // report is one partial-aggregated groupBy.
  private val doc12 = GraftQuery(
    "doc12_pack_sequences",
    (s, dir) => {
      import s.implicits._
      CurationOps.packSequences(t(s, dir, "documents"),
          budget = 512, shards = 8)
        .groupBy($"shard", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("bin_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"shard", $"bin")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split(TRIM(text), ' ')) AS BIGINT)
                 AS n_tokens,
               doc_id % 8 AS shard
        FROM documents),
      c AS (
        SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks),
      b AS (
        SELECT *, CAST(greatest(cum_tokens - 1, 0) // 512 AS BIGINT)
          AS bin FROM c)
      SELECT shard, bin, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM b GROUP BY shard, bin
      ORDER BY shard, bin"""))

  // -------------------------------------------------------------- doc13
  // Benchmark decontamination: the deterministic pseudo-benchmark is
  // every 97th doc; training docs sharing >= 3 distinct word-bigram
  // shingles with it are flagged with their overlap count. The eval
  // shingle vocab is benchmark-sized -> one equi-join against it, work
  // proportional to true overlaps.
  private val decontOracle = """
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM toks WHERE len(ws) >= 2),
      ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM tr JOIN ev USING (shingle)
      GROUP BY tr.doc_id
      HAVING COUNT(*) >= 3
      ORDER BY doc_id"""

  private val doc13 = GraftQuery(
    "doc13_decontaminate",
    (s, dir) => {
      import s.implicits._
      CurationOps.contamination(
          DedupOps.docShingles(t(s, dir, "documents")),
          isEval = col("doc_id") % 97 === 0, minOverlap = 3)
        .orderBy($"doc_id")
    },
    Some(decontOracle))

  // -------------------------------------------------------------- doc44
  // Two-stage BLOOM-GATED decontamination: the doc42 bit set built
  // over the eval vocabulary prefilters the corpus — a doc reaches
  // the exact overlap join only if ≥ 3 of its distinct shingles are
  // bloom-POSITIVE, which is a lossless gate (no false negatives, so
  // bloom-positive count ≥ true overlap count: every truly
  // contaminated doc passes). The pattern this pins is the
  // cross-cluster / privacy-bounded decontamination at 100 TB: the
  // eval set never ships, only its KB-sized bit array does, and the
  // exact join touches suspect docs alone. Output must EQUAL plain
  // doc13 — doc13's oracle is the gate (losslessness is the claim).
  private val doc44 = GraftQuery(
    "doc44_bloom_decontaminate",
    (s, dir) => {
      import s.implicits._
      CurationOps.contaminationBloomGated(
          DedupOps.docShingles(t(s, dir, "documents")),
          isEval = col("doc_id") % 97 === 0, minOverlap = 3)
        .orderBy($"doc_id")
    },
    Some(decontOracle))

  // -------------------------------------------------------------- doc14
  // Training-mixture sampling: per-language inclusion rates (en 25%,
  // fr/es 50%, zh 75%, de 100% of the 0-255 hash space), reported per
  // language with the min/max selected bucket as an audit of the
  // threshold. Deterministic hash gating -> the same docs are selected
  // under any re-run or repartitioning.
  private val doc14 = GraftQuery(
    "doc14_mixture_sample",
    (s, dir) => {
      import s.implicits._
      CurationOps.mixtureSample(t(s, dir, "documents"), "lang",
          Map("en" -> 64, "fr" -> 128, "es" -> 128, "zh" -> 192,
            "de" -> 256))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"),
          min($"bucket").as("min_bucket"),
          max($"bucket").as("max_bucket"))
        .orderBy($"lang")
    },
    Some("""
      WITH h AS (
        SELECT lang,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               AS BIGINT) AS bucket,
          CASE lang WHEN 'en' THEN 64 WHEN 'fr' THEN 128
                    WHEN 'es' THEN 128 WHEN 'zh' THEN 192
                    WHEN 'de' THEN 256 ELSE 0 END AS rate256
        FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket
      FROM h WHERE bucket < rate256
      GROUP BY lang ORDER BY lang"""))

  // -------------------------------------------------------------- doc26
  // Quality-weighted sampling: the composition every curation run
  // ends with — band documents by the (doc01-proven) quality score,
  // then keep each band at its own deterministic hash rate (low cut
  // entirely, top kept whole). Bands use FIXED thresholds, not
  // ntile/percent_rank (rank banding depends on the corpus sample a
  // partition sees; thresholds are reproducible across reprocessing
  // runs, which is the property training pipelines need). Same
  // codegen-filter shape as doc14 — no shuffle before the report.
  private val doc26 = GraftQuery(
    "doc26_quality_weighted_sample",
    (s, dir) => {
      import s.implicits._
      val q = graft.functions.TextFunctions.qualityScore($"text")
      val banded = t(s, dir, "documents").withColumn("qband",
        when(q < 0.3, "0_low").when(q < 0.6, "1_mid")
          .when(q < 0.8, "2_high").otherwise("3_top"))
      CurationOps.mixtureSample(banded, "qband",
          Map("1_mid" -> 64, "2_high" -> 128, "3_top" -> 256))
        .groupBy($"qband")
        .agg(count(lit(1)).as("n_sampled"),
          min($"bucket").as("min_bucket"),
          max($"bucket").as("max_bucket"))
        .orderBy($"qband")
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
          CASE WHEN quality < 0.3 THEN '0_low'
               WHEN quality < 0.6 THEN '1_mid'
               WHEN quality < 0.8 THEN '2_high'
               ELSE '3_top' END AS qband,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               AS BIGINT) AS bucket
        FROM q),
      r AS (
        SELECT *, CASE qband WHEN '1_mid' THEN 64 WHEN '2_high' THEN 128
                             WHEN '3_top' THEN 256 ELSE 0 END AS rate256
        FROM b)
      SELECT qband, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket
      FROM r WHERE bucket < rate256
      GROUP BY qband ORDER BY qband"""))

  // -------------------------------------------------------------- doc27
  // SPAN-level decontamination: training docs sharing even ONE 4-word
  // span with the eval set (every 97th doc) — the long-verbatim-leak
  // probe bigram overlap dilutes (a quoted benchmark answer inside an
  // otherwise-original doc shares few bigrams but whole spans).
  // Same equi-join-vs-benchmark-vocab shape as doc13, stricter unit,
  // minOverlap 1: verbatim 4-grams are strong leak evidence (w=4
  // chosen so the generator corpus produces a non-empty flag set —
  // 8-grams never cross the eval boundary here, which would make the
  // oracle trivially empty).
  private val doc27 = GraftQuery(
    "doc27_span_decontaminate",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val spans = docs
        .select($"doc_id",
          graft.functions.TextFunctions.tokens($"text").as("ts"))
        .select($"doc_id",
          explode(graft.functions.TextFunctions
            .wordGramsFromTokens($"ts", 4)).as("shingle"))
      CurationOps.contamination(spans,
          isEval = $"doc_id" % 97 === 0, minOverlap = 1)
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws) - 2),
            i -> array_to_string(list_slice(ws, i, i + 3), ' ')))
            AS span
        FROM toks WHERE len(ws) >= 4),
      ev AS (SELECT DISTINCT span FROM sp WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, span FROM sp WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM tr JOIN ev USING (span)
      GROUP BY tr.doc_id
      HAVING COUNT(*) >= 1
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- emb08
  // K-means assignment step: every vector to its nearest of 8 fixed
  // centroids (broadcast scan), reported per cluster with
  // order-independent stats (count, min/max cosine — exact doubles on
  // both engines; no order-dependent float sums).
  private val emb08 = GraftQuery(
    "emb08_cluster_assign",
    (s, dir) => {
      import s.implicits._
      CurationOps.assignClusters(t(s, dir, "embeddings"))
        .groupBy($"cid")
        .agg(count(lit(1)).as("n_members"),
          min($"ccos").as("min_cos"), max($"ccos").as("max_cos"))
        .orderBy($"cid")
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${LlmQueries.normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${LlmQueries.normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, c.cid,
          (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
            / (b.en * c.cn) AS ccos,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c)
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
             MIN(ccos) AS min_cos, MAX(ccos) AS max_cos
      FROM assign WHERE rn = 1
      GROUP BY cid ORDER BY cid"""))

  // -------------------------------------------------------------- emb09
  // K-means Lloyd UPDATE step (the half emb08's assignment leaves
  // out): members of each seed centroid, then the per-dimension
  // fixed-point mean numerators — n_members, Σs (total quantized
  // mass) and Σs² (dimension-sensitive checksum; permutation of dims
  // would change it). Exact integer arithmetic end-to-end after the
  // bit-exact double assignment, so the result is partition-order-
  // proof on both engines. Scale: one broadcast corpus scan + one
  // map-side-combined k·dim aggregate.
  private val emb09 = GraftQuery(
    "emb09_kmeans_step",
    (s, dir) => {
      import s.implicits._
      val embs = t(s, dir, "embeddings")
      val seeds = embs.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      val assigned = SimilarityOps.assignToCentroids(embs, seeds, 64)
        .filter($"rn" === 1)
      CurationOps.centroidSums(assigned, 64)
        .groupBy($"cid")
        .agg(max($"n").as("n_members"),
          sum($"s").as("fp_sum"),
          sum(expr("cast(s as decimal(19,0)) * cast(s as decimal(19,0))"))
            .cast("double").as("fp_sq_sum"))
        .orderBy($"cid")
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${LlmQueries.normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${LlmQueries.normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, c.cid, b.embedding,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      mem AS (SELECT cid, embedding FROM assign WHERE rn = 1),
      qv AS (
        SELECT m.cid, t.i AS pos,
          CAST(FLOOR(CAST(m.embedding[t.i] AS DOUBLE) * 1000000)
               AS BIGINT) AS q
        FROM mem m, range(1, 65) t(i)),
      dims AS (
        SELECT cid, pos, CAST(SUM(q) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM qv GROUP BY cid, pos)
      SELECT cid, CAST(MAX(n) AS BIGINT) AS n_members,
             CAST(SUM(s) AS BIGINT) AS fp_sum,
             CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE) AS fp_sq_sum
      FROM dims GROUP BY cid ORDER BY cid"""))

  // -------------------------------------------------------------- emb10
  // Cluster-balanced sampling: nearest-centroid assignment (emb08's
  // proven formulation) composed with the deterministic id-hash gate
  // (doc14's) at per-cluster rates — down-sample dominant clusters,
  // keep rare ones whole, stably under any re-run/repartition.
  // Reported per cluster with the min/max selected bucket as the
  // threshold audit.
  private val emb10 = GraftQuery(
    "emb10_cluster_sample",
    (s, dir) => {
      import s.implicits._
      CurationOps.clusterSample(t(s, dir, "embeddings"),
          rates256 = (0L until 8L).map(c =>
            c -> Seq(64, 128, 192, 256)((c % 4).toInt)).toMap)
        .groupBy($"cid")
        .agg(count(lit(1)).as("n_sampled"),
          min($"bucket").as("min_bucket"),
          max($"bucket").as("max_bucket"))
        .orderBy($"cid")
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${LlmQueries.normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${LlmQueries.normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      g AS (
        SELECT vec_id, cid,
          CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 2))
               AS BIGINT) AS bucket,
          CASE cid % 4 WHEN 0 THEN 64 WHEN 1 THEN 128
                       WHEN 2 THEN 192 ELSE 256 END AS rate256
        FROM assign WHERE rn = 1)
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket
      FROM g WHERE bucket < rate256
      GROUP BY cid ORDER BY cid"""))

  // -------------------------------------------------------------- doc15
  // PII scrubbing: emails/phones planted deterministically (every 3rd
  // doc gets an address, every 4th a phone), then detected and
  // redacted with shared RE2-compatible patterns. The oracle replays
  // detection counts, redacted lengths and per-doc redaction flags —
  // Java regex (Spark) and RE2 (DuckDB) must pick the same spans.
  private val doc15 = GraftQuery(
    "doc15_pii_redact",
    (s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions
      val withPii = t(s, dir, "documents").withColumn("ptext",
        concat($"text",
          when(pmod($"doc_id", lit(3)) === 0,
            concat(lit(" contact user"), $"doc_id",
              lit("@mail.example.com"))).otherwise(lit("")),
          when(pmod($"doc_id", lit(4)) === 0,
            concat(lit(" call +1-555-"),
              lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      withPii
        .withColumn("rtext", TextFunctions.redactPii($"ptext"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.emailCount($"ptext")).as("emails_found"),
          sum(TextFunctions.phoneCount($"ptext")).as("phones_found"),
          sum(length($"rtext")).as("redacted_len"),
          sum(when($"rtext".contains("<EMAIL>") ||
              $"rtext".contains("<PHONE>"), 1L).otherwise(0L))
            .as("docs_redacted"))
        .orderBy($"lang")
    },
    Some("""
      WITH pii AS (
        SELECT doc_id, lang, text ||
          CASE WHEN doc_id % 3 = 0
               THEN ' contact user' || doc_id || '@mail.example.com'
               ELSE '' END ||
          CASE WHEN doc_id % 4 = 0
               THEN ' call +1-555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS ptext
        FROM documents),
      red AS (
        SELECT lang, ptext,
          regexp_replace(
            regexp_replace(ptext,
              '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS rtext
        FROM pii)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(regexp_extract_all(ptext,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT)
          AS emails_found,
        CAST(SUM(len(regexp_extract_all(ptext,
          '\+?[0-9][0-9-]{6,}[0-9]'))) AS BIGINT) AS phones_found,
        CAST(SUM(len(rtext)) AS BIGINT) AS redacted_len,
        CAST(SUM(CASE WHEN contains(rtext, '<EMAIL>')
                        OR contains(rtext, '<PHONE>')
                      THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted
      FROM red GROUP BY lang ORDER BY lang"""))

  // -------------------------------------------------------------- doc16
  // N-gram repetition ratio (the Gopher-style repetitiveness quality
  // signal): most-frequent-bigram share of all bigram occurrences per
  // doc. Ratio is integer/integer in double — bit-exact both engines.
  private val doc16 = GraftQuery(
    "doc16_repetition",
    (s, dir) => {
      import s.implicits._
      CurationOps.repetitionStats(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS bg
        FROM toks WHERE len(ws) >= 2),
      c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg
            GROUP BY doc_id, bg)
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS max_count,
             CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc20
  // Span-level duplicate detection: per doc, the share of its distinct
  // 8-word spans that occur in at least one other document — the
  // exact-substring-dedup signal at span granularity (whole-doc
  // fingerprints miss a duplicated passage inside otherwise-distinct
  // docs). The oracle rebuilds spans with list_slice and recounts df.
  // dfCap engages the stop-span guard (boilerplate spans split off via
  // broadcast anti-join, docs credited directly — identical results,
  // join-key skew capped); the ORACLE is the uncapped formulation, so
  // the equivalence itself is under the hash check.
  private val doc20 = GraftQuery(
    "doc20_span_dedup",
    (s, dir) => {
      import s.implicits._
      CurationOps.dupSpanStats(t(s, dir, "documents"), w = 8, dfCap = 16L)
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sp AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws) - 6),
            i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS span
        FROM toks WHERE len(ws) >= 8),
      df AS (SELECT span, COUNT(*) AS span_df FROM sp GROUP BY span)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        CAST(SUM(CASE WHEN span_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_spans,
        CAST(SUM(CASE WHEN span_df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
      FROM sp JOIN df USING (span)
      GROUP BY doc_id ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc21
  // Lexical-diversity profile: type-token ratio, hapax ratio, Simpson
  // repeat concentration Σc(c−1)/(N(N−1)) — vocabulary-richness
  // quality signals, all exact integer ratios (no libm entropy — logs
  // differ across platforms; see doc09's idf note), so bit-identical
  // on both engines.
  private val doc21 = GraftQuery(
    "doc21_lexical_diversity",
    (s, dir) => {
      import s.implicits._
      CurationOps.lexicalDiversity(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS word
        FROM documents),
      c AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM toks WHERE word <> '' GROUP BY doc_id, word),
      agg AS (
        SELECT doc_id,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hapax,
          CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs
        FROM c GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_types, n_hapax, rep_pairs,
        CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
        CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio,
        CASE WHEN n_tokens > 1
          THEN CAST(rep_pairs AS DOUBLE)
                 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
          ELSE 0.0 END AS simpson
      FROM agg ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc22
  // Gopher-style quality rule battery: per-rule booleans + the
  // conjunction, so the audit of WHICH rule kills a doc is in the
  // result. Scan-side codegen only (no shuffle) — the raw-corpus
  // sweep shape. Double-valued rules are single divisions of exact
  // integers, so the booleans compare exactly across engines.
  private val doc22 = GraftQuery(
    "doc22_quality_rules",
    (s, dir) => {
      import s.implicits._
      CurationOps.gopherQuality(t(s, dir, "documents"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, text, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))
            AS BIGINT) AS n_token_chars,
          CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
            AS BIGINT) AS n_alpha_tokens,
          CAST(len(regexp_extract_all(text,
            '\b(the|a|an|of|to|and|in|is|on|for)\b')) AS BIGINT)
            AS n_stopwords
        FROM base),
      r AS (
        SELECT *,
          CAST(n_token_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS mean_word_len,
          CAST(n_alpha_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS alpha_frac
        FROM m)
      SELECT doc_id, n_tokens, n_token_chars, n_alpha_tokens,
        n_stopwords, mean_word_len, alpha_frac,
        (n_tokens >= 50 AND n_tokens <= 100000) AS pass_len,
        (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
          AS pass_word_len,
        (alpha_frac >= 0.8) AS pass_alpha,
        (n_stopwords >= 2) AS pass_stop,
        ((n_tokens >= 50 AND n_tokens <= 100000)
          AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
          AND (alpha_frac >= 0.8) AND (n_stopwords >= 2)) AS pass_all
      FROM r ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc23
  // Corpus-frequency rarity profile: rare-vocabulary share + mean
  // corpus frequency per doc — the distributional quality signal a
  // perplexity filter approximates, in exact integer statistics (no
  // libm logs). The Spark side runs the Zipf-head/tail SPLIT join
  // (head broadcast, tail shuffle with fan-in <= hotDf); the oracle is
  // the plain single-join formulation, so the split's equivalence is
  // itself under the hash check. rareMax 300 / hotDf 500 split the
  // generator's vocabulary non-trivially at sf0.01.
  private val doc23 = GraftQuery(
    "doc23_rarity_profile",
    (s, dir) => {
      import s.implicits._
      CurationOps.rarityProfile(t(s, dir, "documents"),
          rareMax = 300L, hotDf = 500L)
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS word
        FROM documents),
      pairs AS (
        SELECT doc_id, word, COUNT(*) AS c_doc
        FROM toks WHERE word <> '' GROUP BY doc_id, word),
      vocab AS (
        SELECT word, CAST(SUM(c_doc) AS BIGINT) AS cf
        FROM pairs GROUP BY word),
      j AS (
        SELECT p.doc_id, p.c_doc, v.cf
        FROM pairs p JOIN vocab v USING (word)),
      a AS (
        SELECT doc_id,
          CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN cf <= 300 THEN c_doc ELSE 0 END)
            AS BIGINT) AS n_rare,
          CAST(SUM(CAST(c_doc AS HUGEINT) * cf) AS DECIMAL(38,0))
            AS freq_mass
        FROM j GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_rare,
        CAST(freq_mass AS BIGINT) AS freq_mass,
        CAST((CAST(n_rare AS HUGEINT) * 1000000) // n_tokens
          AS BIGINT) AS rare_ppm,
        CAST((CAST(freq_mass AS HUGEINT) * 1000) // n_tokens
          AS BIGINT) AS mean_freq_x1000
      FROM a ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc24
  // Curation-funnel report: per-stage survivor counts through quality
  // rules → exact dedup → decontamination — the yield observability
  // every production curation run needs. The oracle restates all
  // three stages independently (the dedup stage groups by md5(text),
  // the decontam stage rebuilds the bigram overlap probe).
  private val doc24 = GraftQuery(
    "doc24_curation_funnel",
    (s, dir) => {
      import s.implicits._
      CurationOps.curationFunnel(t(s, dir, "documents"))
        .orderBy($"stage")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, text,
          CAST(len(string_split(TRIM(text), ' ')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))
            AS BIGINT) AS n_token_chars,
          CAST(len(list_filter(string_split(TRIM(text), ' '),
            w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
            AS n_alpha_tokens,
          CAST(len(regexp_extract_all(text,
            '\b(the|a|an|of|to|and|in|is|on|for)\b')) AS BIGINT)
            AS n_stopwords
        FROM documents),
      q AS (
        SELECT doc_id, text FROM m
        WHERE n_tokens BETWEEN 50 AND 100000
          AND CAST(n_token_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            BETWEEN 3.0 AND 10.0
          AND CAST(n_alpha_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            >= 0.8
          AND n_stopwords >= 2),
      surv AS (
        SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
      toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM toks WHERE len(ws) >= 2),
      ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      cont AS (
        SELECT sh.doc_id FROM sh JOIN ev USING (shingle)
        WHERE sh.doc_id % 97 <> 0
        GROUP BY sh.doc_id HAVING COUNT(*) >= 3),
      fin AS (
        SELECT s.doc_id FROM surv s
        WHERE s.doc_id % 97 <> 0
          AND NOT EXISTS (SELECT 1 FROM cont c
                          WHERE c.doc_id = s.doc_id))
      SELECT '1_total' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
      UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT) FROM q
      UNION ALL SELECT '3_dedup', CAST(COUNT(*) AS BIGINT) FROM surv
      UNION ALL SELECT '4_decontam', CAST(COUNT(*) AS BIGINT) FROM fin
      ORDER BY stage"""))

  // -------------------------------------------------------------- doc25
  // Incremental LSH dedup index: documents arrive in THREE batches
  // (plus one REDELIVERED batch — must contribute nothing); each batch
  // computes signatures for ITS docs only and collides them against
  // the bucketed band index. The union of per-batch candidates,
  // Jaccard-verified, must equal the one-shot doc04 answer — proving
  // the O(batch) incremental sweep loses no pairs. The oracle is the
  // one-shot MinHash→LSH→verify replay.
  private val doc25 = GraftQuery(
    "doc25_incremental_lsh",
    (s, dir) => {
      import s.implicits._
      val table = "doc25_index"
      graft.streaming.CdcMerge.dropStateTable(s, table)
      val docs = t(s, dir, "documents")
      def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
      val perBatch = Seq(part(0), part(1), part(1), part(2)).map { b =>
        graft.streaming.IncrementalDedup.indexBatch(s, table, b)
      }
      val cands = perBatch.reduce(_ unionByName _).distinct()
      DedupOps.verifyPairs(DedupOps.docShingles(docs), cands,
          minJ = 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(LlmQueries.minhashLshOracle(LlmQueries.bigramShCtes,
      minJ = 0.2)))

  // -------------------------------------------------------------- emb14
  // Incremental IVF index: embeddings arrive in THREE batches (plus
  // one REDELIVERED batch — must append nothing); each batch assigns
  // against the centroids FROZEN at index creation and appends to its
  // cid partitions. A 2-probe search over the converged table must
  // equal the one-shot emb05 multi-probe answer — the oracle is that
  // one-shot replay. Batch 1 spans vec_id < 100, so the frozen
  // centroid set is the same first-8 set the one-shot path uses.
  private val emb14 = GraftQuery(
    "emb14_incremental_ivf",
    (s, dir) => {
      import s.implicits._
      val table = "emb14_index"
      Seq(table, s"${table}_centroids")
        .foreach(graft.streaming.CdcMerge.dropStateTable(s, _))
      val embs = t(s, dir, "embeddings")
      val batches = Seq(
        embs.filter($"vec_id" < 100),
        embs.filter($"vec_id" >= 100 && $"vec_id" < 200),
        embs.filter($"vec_id" >= 100 && $"vec_id" < 200), // replay
        embs.filter($"vec_id" >= 200))
      batches.foreach(b =>
        graft.streaming.IncrementalAnn.indexBatch(s, table, b))
      graft.streaming.IncrementalAnn.searchTopK(s, table,
          embs.filter($"vec_id" >= 8 && $"vec_id" < 12)
            .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
          nProbe = 2, k = 5)
        .orderBy($"query_id", $"rnk")
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${LlmQueries.normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${LlmQueries.normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      clustered AS (
        SELECT vec_id, embedding, en, cid FROM assign WHERE rn = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn, cid
        FROM assign WHERE vec_id >= 8 AND vec_id < 12 AND rn <= 2),
      scored AS (
        SELECT q.query_id, c.vec_id,
          (${LlmQueries.dotSql("q_emb", "c.embedding", 64)})
            / (q.qn * c.en) AS cos
        FROM clustered c JOIN q
          ON c.cid = q.cid AND c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb15
  // FILTERED ANN: metadata predicate (vec_id % 3 = 0 as the stand-in
  // for lang/license columns) composed with multi-probe IVF search —
  // post-filter-then-rank semantics, so each query still gets up to k
  // PASSING neighbors (filtering after the top-k returns fewer or
  // none: the classic filtered-ANN bug). The oracle applies the same
  // predicate to the clustered corpus before scoring.
  private val emb15 = GraftQuery(
    "emb15_filtered_ann",
    (s, dir) => {
      import s.implicits._
      SimilarityOps.ivfTopKProbed(t(s, dir, "embeddings"), nProbe = 2,
          corpusFilter = pmod($"vec_id", lit(3)) === 0)
        .orderBy($"query_id", $"rnk")
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${LlmQueries.normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding,
               ${LlmQueries.normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${LlmQueries.dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      clustered AS (
        SELECT vec_id, embedding, en, cid FROM assign
        WHERE rn = 1 AND vec_id % 3 = 0),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn, cid
        FROM assign WHERE vec_id >= 8 AND vec_id < 12 AND rn <= 2),
      scored AS (
        SELECT q.query_id, c.vec_id,
          (${LlmQueries.dotSql("q_emb", "c.embedding", 64)})
            / (q.qn * c.en) AS cos
        FROM clustered c JOIN q
          ON c.cid = q.cid AND c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  val all: Seq[GraftQuery] =
    Seq(doc12, doc13, doc14, doc15, doc16, doc20, doc21, doc22, doc23,
      doc24, doc25, doc26, doc27, emb08, emb09, emb10, emb14, emb15,
      doc44)
}
