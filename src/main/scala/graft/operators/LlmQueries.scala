package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.functions.TextFunctions
import graft.sources.Tables

/** LLM-training-data pipeline queries (SURVEY.md §2.3 extension):
  * text analysis, dedup (exact / MinHash-LSH / SimHash), similarity
  * search (brute-force + LSH ANN), embedding near-dups, multimodal
  * columns. Oracles restate every SQL-expressible op for DuckDB; the
  * vector oracles are generated with the same fixed-association double
  * chains the Spark expressions use, so floats match bit-for-bit.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // u64-emulation constants for the DuckDB oracles (HUGEINT modular
  // arithmetic replaying Java Long wrap/logical-shift semantics)
  private val U64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val I63 = "CAST('9223372036854775808' AS HUGEINT)"

  // ---- shared SQL generators (oracle side of SimilarityOps) ----------
  private[operators] def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .reduceLeft((acc, t) => s"($acc + $t)")

  private[operators] def normSql(c: String, dim: Int): String =
    "sqrt(" + (1 to dim).map(i =>
      s"(CAST($c[$i] AS DOUBLE)*CAST($c[$i] AS DOUBLE))")
      .reduceLeft((acc, t) => s"($acc + $t)") + ")"

  private[operators] def bucketSql(c: String, dim: Int, planes: Int,
      offset: Int = 0): String = {
    val bits = (0 until planes).map { p =>
      val terms = (1 to dim).flatMap { i =>
        val w = SimilarityOps.planeWeight(p + offset, i)
        if (w == 0) None else Some(s"CAST($c[$i] AS DOUBLE)*$w.0")
      }
      s"CASE WHEN ${terms.reduceLeft((acc, t) => s"($acc + $t)")} > 0.0 THEN '1' ELSE '0' END"
    }
    s"concat(${bits.mkString(", ")})"
  }

  // -------------------------------------------------------------- doc01
  // Text statistics: token counts, lengths, stopword ratio, quality.
  private val doc01 = GraftQuery(
    "doc01_text_stats",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      docs.select(
        $"doc_id", $"n_chars",
        TextFunctions.tokenCount($"text").as("n_tokens"),
        TextFunctions.tokenChars($"text").as("n_token_chars"),
        TextFunctions.avgTokenLen($"text").as("avg_token_len"),
        TextFunctions.stopwordCount($"text").as("n_stopwords"),
        TextFunctions.stopwordRatio($"text").as("stopword_ratio"),
        TextFunctions.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, n_chars,
          CAST(LEN(string_split(TRIM(text), ' ')) AS BIGINT) AS n_tokens,
          CAST(LENGTH(REGEXP_REPLACE(text, '[^a-z0-9]', '', 'g')) AS BIGINT) AS n_token_chars,
          CAST(LEN(regexp_extract_all(text, '\b(the|a|an|of|to|and|in|is|on|for)\b')) AS BIGINT) AS n_stopwords
        FROM documents)
      SELECT doc_id, n_chars, n_tokens, n_token_chars,
        CAST(n_token_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
        n_stopwords,
        CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
        LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
          * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
      FROM base
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc02
  // Language-ID heuristic vs the labeled lang column (confusion matrix).
  private val doc02 = GraftQuery(
    "doc02_langid",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang",
          TextFunctions.langIdHeuristic($"text").as("predicted"))
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    },
    Some("""
      SELECT lang,
        CASE
          WHEN contains(' ' || text || ' ', ' der ')
            OR contains(' ' || text || ' ', ' und ') THEN 'de'
          WHEN contains(' ' || text || ' ', ' le ')
            OR contains(' ' || text || ' ', ' la ') THEN 'fr'
          WHEN contains(' ' || text || ' ', ' el ')
            OR contains(' ' || text || ' ', ' los ') THEN 'es'
          WHEN contains(' ' || text || ' ', ' the ')
            OR contains(' ' || text || ' ', ' is ') THEN 'en'
          ELSE 'unknown' END AS predicted,
        COUNT(*) AS n
      FROM documents
      GROUP BY 1, 2
      ORDER BY lang, predicted"""))

  // -------------------------------------------------------------- doc03
  // Exact dedup via content fingerprint (hash-groupBy — one shuffle).
  private val doc03 = GraftQuery(
    "doc03_dedup_exact",
    (s, dir) => {
      import s.implicits._
      DedupOps.exactDupGroups(t(s, dir, "documents"))
        .select($"fp", $"survivor_id", $"n_copies")
        .orderBy($"fp")
    },
    Some("""
      SELECT md5(text) AS fp, MIN(doc_id) AS survivor_id,
             COUNT(*) AS n_copies
      FROM documents
      GROUP BY md5(text)
      ORDER BY fp"""))

  /** DuckDB replay of the full FastMix MinHash→LSH→verify pipeline
    * over a caller-supplied shingle CTE (must end defining `sh` with
    * columns (doc_id, shingle)). Emulates the u64 hash with HUGEINT
    * modular arithmetic — HUGEINT is SIGNED int128, so u64·u64
    * multiplies split into 32-bit halves: a*C mod 2^64 = (a*Clo mod
    * 2^64 + (a*Chi mod 2^32)*2^32) mod 2^64, every intermediate
    * < 2^96. The oracle hashes each DISTINCT shingle once (vocab CTE)
    * because list_reduce is expensive in SQL; the Spark side hashes
    * inline because the native expression is one multiply-add per
    * byte. */
  private[operators] def minhashLshOracle(shCtes: String, minJ: Double): String =
    minhashLshPairsCtes(shCtes, minJ) + """
      SELECT doc_a, doc_b, n_inter, jaccard FROM pairs
      ORDER BY doc_a, doc_b"""

  /** The MinHash→LSH→verify replay as a CTE chain ending in
    * `pairs(doc_a, doc_b, n_inter, jaccard)`, so oracles can build on
    * the verified pair set (doc04/doc10 select it directly; doc17
    * closes it transitively). `recursive` prefixes WITH RECURSIVE for
    * consumers that append a recursive CTE. */
  private[operators] def minhashLshPairsCtes(shCtes: String, minJ: Double,
      recursive: Boolean = false): String = {
    val U32 = "CAST('4294967296' AS HUGEINT)"
    def mulmod(a: String, c: java.math.BigInteger): String = {
      val hi = c.shiftRight(32)
      val lo = c.and(java.math.BigInteger.valueOf(0xffffffffL))
      s"(((($a) * $lo) % $U64) + (((($a) * $hi) % $U32) * $U32)) % $U64"
    }
    val C1 = new java.math.BigInteger("18397679294719823053")
    val C2 = new java.math.BigInteger("14181476777654086739")
    def poly(seed: Int): String = {
      val p = graft.functions.VectorExpressions.SeededMixHash
        .prefixHashUnsigned(seed)
      s"""list_reduce(list_prepend(CAST('$p' AS HUGEINT),
         list_transform(range(1, length(shingle) + 1),
           i -> CAST(ascii(substring(shingle, i, 1)) AS HUGEINT))),
         (h, b) -> (h * 31 + b) % $U64)"""
    }
    def cols(f: Int => String): String =
      (0 until 8).map(s => s"${f(s)} AS u$s").mkString(", ")
    val v0 = cols(s => poly(s))
    val x1 = cols(s => s"xor(u$s, u$s >> 33)")
    val m1 = cols(s => mulmod(s"u$s", C1))
    val m2 = cols(s => mulmod(s"u$s", C2))
    val fin = (0 until 8).map(s =>
      s"""CASE WHEN xor(u$s, u$s >> 33) >= $I63
         THEN CAST(xor(u$s, u$s >> 33) - $U64 AS BIGINT)
         ELSE CAST(xor(u$s, u$s >> 33) AS BIGINT) END AS h$s""")
      .mkString(", ")
    val sigCols = (0 until 8).map(i => s"min(h$i) AS h$i").mkString(", ")
    val bandRows = (0 until 4).map(b =>
      s"""SELECT doc_id, $b AS band,
         CAST(h${2 * b} AS VARCHAR) || ',' || CAST(h${2 * b + 1} AS VARCHAR) AS key
         FROM sig""")
      .mkString("\n          UNION ALL ")
    s"""
      WITH ${if (recursive) "RECURSIVE " else ""}$shCtes,
      vocab AS (SELECT DISTINCT shingle FROM sh),
      v0 AS (SELECT shingle, $v0 FROM vocab),
      vx1 AS (SELECT shingle, $x1 FROM v0),
      v1 AS (SELECT shingle, $m1 FROM vx1),
      vx2 AS (SELECT shingle, $x1 FROM v1),
      v2 AS (SELECT shingle, $m2 FROM vx2),
      vh AS (SELECT shingle, $fin FROM v2),
      hs AS (SELECT sh.doc_id, vh.h0, vh.h1, vh.h2, vh.h3, vh.h4, vh.h5,
                    vh.h6, vh.h7
             FROM sh JOIN vh ON sh.shingle = vh.shingle),
      sig AS (SELECT doc_id, $sigCols FROM hs GROUP BY doc_id),
      bands AS (
          $bandRows),
      cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh sa
        JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
        JOIN cands c ON c.doc_a = sa.doc_id AND c.doc_b = sb.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT i.doc_a, i.doc_b, i.n_inter,
          CAST(i.n_inter AS DOUBLE)
            / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE)
            / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= $minJ)"""
  }

  // -------------------------------------------------------------- doc04
  // MinHash + LSH near-dup detection, Jaccard-verified. Full pipeline:
  // bigram shingles → 8 seeded min-hashes (native poly31+fmix64 longs,
  // see VectorExpressions.SeededMixHash) → 4 bands of 2 → bucket-join
  // candidates → exact Jaccard ≥ 0.2. The oracle replays every stage.
  private[operators] val bigramShCtes =
    """toks AS (
        SELECT doc_id, string_split(TRIM(text), ' ') AS ws FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM toks WHERE len(ws) >= 2)"""

  /** Recursive transitive closure over `pairs` ending in
    * `comp(doc_id, component)` — the connected-components replay
    * shared by doc17 (labels) and doc18 (representative selection). */
  private[operators] val ccClosureCtes =
    """,
      nodes AS (
        SELECT doc_a AS node FROM pairs
        UNION SELECT doc_b FROM pairs),
      uedges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT e.b AS node, reach.r AS r
        FROM reach JOIN uedges e ON reach.node = e.a),
      comp AS (
        SELECT node AS doc_id, MIN(r) AS component
        FROM reach GROUP BY node)"""

  private val doc04 = GraftQuery(
    "doc04_minhash_lsh",
    (s, dir) => {
      import s.implicits._
      DedupOps.verifiedNearDups(t(s, dir, "documents"))
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minhashLshOracle(bigramShCtes, minJ = 0.2)))

  // -------------------------------------------------------------- doc17
  // Near-dup CLUSTERS: connected components over the doc04 verified
  // pair list (distributed min-label propagation, one shuffle join per
  // round, O(cluster diameter) rounds) — the step that turns pairwise
  // matches into canonical dup groups so "keep one representative per
  // cluster" is a single groupBy. The oracle closes the same pair set
  // transitively with a recursive CTE and takes the min reachable id.
  private val doc17 = GraftQuery(
    "doc17_dup_clusters",
    (s, dir) => {
      import s.implicits._
      val pairs = DedupOps.verifiedNearDups(t(s, dir, "documents"))
        .select($"doc_a", $"doc_b")
      DedupOps.connectedComponents(pairs).orderBy($"doc_id")
    },
    Some(minhashLshPairsCtes(bigramShCtes, minJ = 0.2,
      recursive = true) + ccClosureCtes + """
      SELECT doc_id, component FROM comp
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc10
  // Character-n-gram (trigram) Jaccard near-dup — the dedup unit that
  // survives word-boundary edits (hyphenation, spacing, punctuation
  // shifts) where word shingles churn. FastMix MinHash→LSH→verify over
  // DedupOps.docCharTrigrams WITH the stop-shingle filter (df ≤ 20% of
  // docs): the generator's tiny word vocabulary makes common trigrams
  // universal, which without the filter collapses band keys into
  // quadratic candidates (measured 200+s at sf0.1; ~2s filtered).
  // After filtering, planted near-dups verify at J ≥ 0.5 while
  // background pairs max out at 0.31 — threshold 0.35 splits them.
  private val doc10 = GraftQuery(
    "doc10_chartrigram_neardup",
    (s, dir) => {
      import s.implicits._
      DedupOps.verifiedNearDupsFrom(
        DedupOps.docCharTrigrams(t(s, dir, "documents")),
        minJ = 0.35, maxDocFrac = 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(minhashLshOracle(
      """sh0 AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, length(text) - 1),
                 i -> substring(text, i, 3))) AS shingle
        FROM documents WHERE length(text) >= 3),
      dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY shingle),
      nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM sh0),
      sh AS (
        SELECT sh0.doc_id, sh0.shingle
        FROM sh0 JOIN dfreq ON sh0.shingle = dfreq.shingle
        WHERE dfreq.df <= 0.2 * (SELECT n FROM nd))""", minJ = 0.35)))

  // -------------------------------------------------------------- doc18
  // End-to-end dedup: pairs → clusters → ONE representative per
  // cluster (longest text, doc_id tiebreak), singletons untouched —
  // the operator that actually shrinks the corpus. Output is the kept
  // documents with their cluster label; the oracle replays closure +
  // ranking in SQL.
  private val doc18 = GraftQuery(
    "doc18_dedup_corpus",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.verifiedNearDups(docs)
        .select($"doc_a", $"doc_b")
      DedupOps.dedupKeepRepresentative(docs, pairs,
        Seq($"n_chars".desc, $"doc_id".asc))
        .select($"doc_id", $"component", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(minhashLshPairsCtes(bigramShCtes, minJ = 0.2,
      recursive = true) + ccClosureCtes + """,
      lab AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY component
                    ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab)
      SELECT doc_id, component, n_chars
      FROM ranked WHERE rn = 1
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc05
  // SimHash fingerprints (16-bit, per-nibble majority vote).
  private val doc05 = GraftQuery(
    "doc05_simhash",
    (s, dir) => {
      import s.implicits._
      DedupOps.simhash(t(s, dir, "documents"))
        .select($"doc_id", $"n_tokens", $"simhash")
        .orderBy($"doc_id")
    },
    Some {
      val bits = (1 to 16).map(i =>
        s"""CASE WHEN SUM(CASE WHEN substring(h, $i, 1) IN
           ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0
           THEN '1' ELSE '0' END""").mkString(", ")
      s"""
      WITH words AS (
        SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS w
        FROM documents),
      h AS (SELECT doc_id, md5(w) AS h FROM words WHERE w <> '')
      SELECT doc_id, COUNT(*) AS n_tokens, concat($bits) AS simhash
      FROM h GROUP BY doc_id ORDER BY doc_id"""
    })

  // -------------------------------------------------------------- emb01
  // Brute-force exact cosine top-10 for 8 query vectors.
  private val emb01 = GraftQuery(
    "emb01_cosine_topk",
    (s, dir) =>
      SimilarityOps.bruteForceTopK(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(s"""
      WITH c AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS e_norm
        FROM embeddings),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, e_norm AS q_norm
        FROM c WHERE vec_id < 8),
      scored AS (
        SELECT q.query_id, c.vec_id,
          (${dotSql("q_emb", "embedding", 64)}) / (q.q_norm * c.e_norm) AS cos
        FROM c JOIN q ON c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 10
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb02
  // LSH-bucketed approximate top-5 (random-hyperplane signs).
  private val emb02 = GraftQuery(
    "emb02_ann_lsh",
    (s, dir) =>
      SimilarityOps.lshTopK(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding,
          ${bucketSql("embedding", 64, 6)} AS bucket,
          ${normSql("embedding", 64)} AS e_norm
        FROM embeddings),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, bucket,
               e_norm AS q_norm
        FROM b WHERE vec_id < 8),
      scored AS (
        SELECT q.query_id, q.bucket, b.vec_id,
          (${dotSql("q_emb", "embedding", 64)}) / (q.q_norm * b.e_norm) AS cos
        FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, bucket, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, bucket, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- doc08
  // Deterministic dataset splitting + stratified sampling: split
  // assignment from a content-independent hash of the id (stable under
  // reprocessing/re-partitioning — the property RAND() lacks), plus a
  // per-language deterministic sample flag for eval subsets.
  private val doc08 = GraftQuery(
    "doc08_split_sample",
    (s, dir) => {
      import s.implicits._
      val hx = substring(md5($"doc_id".cast("string").cast("binary")), 1, 2)
      val bucket = conv(hx, 16, 10).cast("long") // 0..255
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id")
      t(s, dir, "documents")
        .withColumn("bucket", bucket)
        .withColumn("split",
          when($"bucket" < 204, "train") // ~80%
            .when($"bucket" < 230, "val") // ~10%
            .otherwise("test")) // ~10%
        .withColumn("eval_sample",
          row_number().over(w) <= 10) // 10 docs per language
        .select($"doc_id", $"lang", $"bucket", $"split", $"eval_sample")
        .orderBy($"doc_id")
    },
    Some("""
      WITH h AS (
        SELECT doc_id, lang,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
               AS BIGINT) AS bucket,
          md5(CAST(doc_id AS VARCHAR)) AS hfull
        FROM documents)
      SELECT doc_id, lang, bucket,
        CASE WHEN bucket < 204 THEN 'train'
             WHEN bucket < 230 THEN 'val'
             ELSE 'test' END AS split,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hfull, doc_id)
          <= 10 AS eval_sample
      FROM h
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- emb04
  // IVF approximate top-5: coarse cells from 8 fixed centroids,
  // queries probe their own cell. Oracle replays assignment + search.
  private val emb04 = GraftQuery(
    "emb04_ivf_topk",
    (s, dir) =>
      SimilarityOps.ivfTopK(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn) DESC,
            c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      clustered AS (
        SELECT vec_id, embedding, en, cid FROM assign WHERE rn = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn, cid
        FROM clustered WHERE vec_id >= 8 AND vec_id < 12),
      scored AS (
        SELECT q.query_id, q.cid, c.vec_id,
          (${dotSql("q_emb", "c.embedding", 64)}) / (q.qn * c.en) AS cos
        FROM clustered c JOIN q
          ON c.cid = q.cid AND c.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cid, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, cid, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb06
  // Multi-table LSH ANN: 8 independent 4-plane tables, candidates are
  // the union of per-table bucket collisions (AND-within/OR-across —
  // classical LSH amplification). Measured recall@5 on this corpus:
  // 0.50 vs 0.03 for the single 6-plane table (RecallProbe). Oracle
  // replays all 8 tables, the distinct union, and the ranking.
  private val emb06 = GraftQuery(
    "emb06_ann_multitable",
    (s, dir) =>
      SimilarityOps.lshTopKMulti(t(s, dir, "embeddings"),
        planes = 4, tables = 8)
        .orderBy(col("query_id"), col("rnk")),
    Some {
      val tableRows = (0 until 8).map(tb =>
        s"""SELECT vec_id, $tb AS tbl,
           ${bucketSql("embedding", 64, 4, tb * 4)} AS bucket
           FROM embeddings""").mkString("\n          UNION ALL ")
      s"""
      WITH c AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS e_norm
        FROM embeddings),
      b AS (
          $tableRows),
      q AS (SELECT vec_id AS query_id, tbl, bucket FROM b WHERE vec_id < 8),
      cand AS (
        SELECT DISTINCT q.query_id, b.vec_id
        FROM b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
        WHERE b.vec_id <> q.query_id),
      scored AS (
        SELECT cand.query_id, cand.vec_id,
          (${dotSql("qc.embedding", "cc.embedding", 64)})
            / (qc.e_norm * cc.e_norm) AS cos
        FROM cand
        JOIN c cc ON cc.vec_id = cand.vec_id
        JOIN c qc ON qc.vec_id = cand.query_id),
      ranked AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM ranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""
    })

  // -------------------------------------------------------------- emb05
  // Multi-probe IVF top-5: queries probe their 2 nearest cells — the
  // recall lever for boundary queries. Oracle replays cell ranking
  // with rn<=2 on the query side, rn=1 corpus assignment, then global
  // per-query ranking across the probed cells.
  private val emb05 = GraftQuery(
    "emb05_ivf_multiprobe",
    (s, dir) =>
      SimilarityOps.ivfTopKProbed(t(s, dir, "embeddings"), nProbe = 2)
        .orderBy(col("query_id"), col("rnk")),
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce,
               ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      assign AS (
        SELECT b.vec_id, b.embedding, b.en, c.cid,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)}) / (b.en * c.cn) DESC,
            c.cid) AS rn
        FROM base b CROSS JOIN cent c),
      clustered AS (
        SELECT vec_id, embedding, en, cid FROM assign WHERE rn = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn, cid
        FROM assign WHERE vec_id >= 8 AND vec_id < 12 AND rn <= 2),
      scored AS (
        SELECT q.query_id, c.vec_id,
          (${dotSql("q_emb", "c.embedding", 64)}) / (q.qn * c.en) AS cos
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

  // -------------------------------------------------------------- emb03
  // Embedding-cosine near-duplicate pairs within LSH buckets. The data
  // has no planted embedding dups, so assert the operator by lowering
  // the threshold until buckets yield pairs (0.35 → nonempty, bounded).
  private val emb03 = GraftQuery(
    "emb03_embedding_neardup",
    (s, dir) =>
      SimilarityOps.embeddingNearDups(t(s, dir, "embeddings"),
        minCos = 0.35)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding,
          ${bucketSql("embedding", 64, 6)} AS bucket,
          ${normSql("embedding", 64)} AS e_norm
        FROM embeddings)
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
        (${dotSql("a.embedding", "c.embedding", 64)})
          / (a.e_norm * c.e_norm) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE (${dotSql("a.embedding", "c.embedding", 64)})
          / (a.e_norm * c.e_norm) >= 0.35
      ORDER BY id_a, id_b"""))

  // -------------------------------------------------------------- mm01
  // Multimodal columns: binary payload + metadata struct + stub-decoded
  // scalar features (the declarative half; the mapPartitions batch path
  // is mm02, rows-only).
  private val mm01 = GraftQuery(
    "mm01_multimodal_meta",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.toMediaColumns(t(s, dir, "documents"))
      media.select(
        $"doc_id",
        $"media_meta.format".as("format"),
        $"media_meta.n_bytes".as("n_bytes"),
        ascii(substring($"content".cast("string"), 1, 1)).cast("long")
          .as("first_byte"),
        ($"media_meta.n_bytes" % 640).as("width"),
        (($"media_meta.n_bytes" * 7) % 480).as("height"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        'text/plain' AS format,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
        (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 480 AS height
      FROM documents
      ORDER BY doc_id"""))

  // ---- rolling-hash oracle (shared by doc07 + mm02.checksum) ---------
  // h = h*31 + byte with 64-bit wrap, re-expressed in DuckDB via
  // list_reduce over per-character code points (documents are ASCII,
  // asserted by the ascii_ok guard column joining octet_length ==
  // length) with HUGEINT modular arithmetic emulating the wrap, then
  // converted back to signed BIGINT. This is an independent re-
  // implementation, so the hash check pins the native codegen
  // expression against a second engine.
  private val rollingHashCte = s"""
      rh AS (
        SELECT doc_id, text,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          list_reduce(
            list_prepend(CAST(0 AS HUGEINT),
              list_transform(range(1, length(text) + 1),
                i -> CAST(ascii(substring(text, i, 1)) AS HUGEINT))),
            (h, b) -> (h * 31 + b) % $U64) AS uh
        FROM documents),
      fp AS (
        SELECT doc_id, n_bytes,
          CASE WHEN uh >= $I63 THEN CAST(uh - $U64 AS BIGINT)
               ELSE CAST(uh AS BIGINT) END AS rhash,
          CAST(CASE WHEN length(text) = 0 THEN 0
               ELSE ascii(substring(text, 1, 1)) END AS BIGINT) AS first_byte
        FROM rh)"""

  // -------------------------------------------------------------- mm02
  // Batch decode path (mapPartitions, typed Dataset). The stub decode
  // is a pure function of the bytes, so the DuckDB oracle independently
  // recomputes every feature (checksum = the 64-bit rolling hash) —
  // putting the executor-side mapPartitions path itself under the hard
  // hash check, not just a rows-only count.
  private val mm02 = GraftQuery(
    "mm02_decode_features",
    (s, dir) => {
      val media = MultimodalOps.toMediaColumns(t(s, dir, "documents"))
      MultimodalOps.extractFeatures(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"),
          col("first_byte").cast("long").as("first_byte"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("checksum"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $rollingHashCte
      SELECT doc_id, n_bytes, first_byte,
        n_bytes % 640 AS width,
        (n_bytes * 7) % 480 AS height,
        rhash AS checksum
      FROM fp
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc06
  // BPE-ish token counting: letter runs, digit runs, and symbol runs
  // counted separately (the cheap proxy for subword-tokenizer budgeting).
  private val doc06 = GraftQuery(
    "doc06_token_pieces",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          size(regexp_extract_all($"text",
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))).cast("long")
            .as("n_pieces"),
          size(regexp_extract_all($"text", lit("[a-z]+"), lit(0)))
            .cast("long").as("n_letter_runs"),
          size(regexp_extract_all($"text", lit("[0-9]+"), lit(0)))
            .cast("long").as("n_digit_runs"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS BIGINT) AS n_pieces,
        CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_letter_runs,
        CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs
      FROM documents
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- doc19
  // BM25 ranked retrieval for a fixed query term set — the relevance
  // scorer a training-data search/inspection surface needs. Uses the
  // RATIONAL idf (N − df + 0.5)/(df + 0.5) instead of its log: same
  // ranking monotonicity, but IEEE-exact and engine-portable (libm
  // log differs across platforms — the doc09 determinism contract).
  // Scale shape: tf over an exploded token stream filtered to the
  // query terms BEFORE the shuffle (the term filter is a pushed-down
  // isin over the explode — work ∝ query-term hits, not corpus
  // vocabulary), df/avgdl as 1-row/terms-sized broadcasts, one keyed
  // top-k window.
  private val doc19 = GraftQuery(
    "doc19_bm25",
    (s, dir) => {
      import s.implicits._
      // the scorer lives in RetrievalOps (shared with the doc51 RRF
      // fusion and, through cdc44's oracle, the maintained postings
      // twin — one computation, three pinned surfaces). Global top-20
      // via orderBy+limit → TakeOrderedAndProject, not a
      // partition-less rank window (the PlanQualitySpec contract).
      RetrievalOps.bm25Scores(t(s, dir, "documents"),
          Seq("spark", "merge", "window"))
        .orderBy($"bm25".desc, $"doc_id")
        .limit(20)
    },
    Some(LlmQueries.bm25Oracle))

  // Shared with the maintained twin (cdc44, OpsQueries): the
  // fold == one-shot equality claim is only meaningful if both
  // queries pin against the IDENTICAL oracle text. A def, not a val:
  // doc19 above captures it during object init, before a val here
  // would have initialized.
  private[operators] def bm25Oracle: String = ("""
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
      scored AS (
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
            AS bm25,
          COUNT(*) AS n_terms_hit
        FROM scored GROUP BY doc_id)
      SELECT doc_id, n_terms_hit, bm25
      FROM agg
      ORDER BY bm25 DESC, doc_id
      LIMIT 20""")

  // -------------------------------------------------------------- emb11
  // Product quantization + asymmetric-distance search: each 64-float
  // vector compresses to 8 sub-codes (nearest of 4 sub-centroids per
  // 8-dim subspace, squared L2, deterministic first-k codebook); a
  // query ranks the corpus by summed distance-table lookups at those
  // codes, never touching raw corpus floats — the memory-bound ANN
  // tier under IVF/LSH. ADC totals add the 8 subspace partials in
  // fixed order (conditional aggregates — the doc19 float-sum rule).
  // The oracle replays slicing, codebooks, encode argmin, and ADC.
  /** The PQ encode + ADC replay as a CTE chain ending in
    * `pqranked(query_id, vec_id, adc, rnk)` — shared by emb11 (direct
    * ADC top-k) and emb12 (wide ADC pool + exact rerank). */
  private def pqAdcCtes(subCount: Int, k: Int): String = {
    val sub = 64 / subCount
    val adcSum = (0 until subCount).map(i =>
      s"COALESCE(MAX(CASE WHEN sm = $i THEN d END), 0.0)")
      .reduceLeft((acc, t) => s"($acc + $t)")
    s"""
      WITH ms AS (SELECT unnest(range(0, $subCount)) AS m),
      sub AS (
        SELECT b.vec_id, ms.m,
               list_slice(b.embedding, ms.m*$sub + 1,
                          ms.m*$sub + $sub) AS sv
        FROM embeddings b CROSS JOIN ms),
      cb AS (SELECT vec_id AS cid, m, sv AS ce FROM sub
             WHERE vec_id < $k),
      pairs0 AS (
        SELECT s.vec_id, s.m, cb.cid, s.sv AS sv, cb.ce AS ce
        FROM sub s JOIN cb ON cb.m = s.m),
      dist AS (
        SELECT vec_id, m, cid,
          ((${dotSql("sv", "sv", sub)})
            - 2.0*(${dotSql("sv", "ce", sub)})
            + (${dotSql("ce", "ce", sub)})) AS d
        FROM pairs0),
      codes AS (
        SELECT vec_id, m, cid AS code FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                      ORDER BY d, cid) AS rn
          FROM dist)
        WHERE rn = 1),
      qdt AS (
        SELECT vec_id AS query_id, m, cid, d FROM dist
        WHERE vec_id >= 8 AND vec_id < 12),
      partials AS (
        SELECT q.query_id, c.vec_id, c.m AS sm, q.d
        FROM codes c JOIN qdt q ON q.m = c.m AND q.cid = c.code
        WHERE c.vec_id <> q.query_id),
      adc AS (
        SELECT query_id, vec_id, $adcSum AS adc
        FROM partials GROUP BY query_id, vec_id),
      pqranked AS (
        SELECT query_id, vec_id, adc,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adc, vec_id) AS BIGINT) AS rnk
        FROM adc)"""
  }

  private val emb11 = GraftQuery(
    "emb11_pq_adc",
    (s, dir) =>
      SimilarityOps.pqTopK(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(pqAdcCtes(8, 4) + """
      SELECT query_id, vec_id AS neighbor_id, rnk, adc
      FROM pqranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- emb12
  // PQ with exact re-ranking — how PQ deploys in practice: the ADC
  // pass nominates a 50-wide candidate pool from the codes alone, then
  // ONLY those rows are re-scored with exact cosine on raw floats and
  // cut to 5. Exact math touches `candidates` rows per query instead
  // of the corpus; recall is governed by pool width (measured ladder
  // in SCALE.md: 0.10 direct → 0.95 at m16/c800). The oracle replays
  // ADC pool + rerank.
  private val emb12 = GraftQuery(
    "emb12_pq_rerank",
    (s, dir) =>
      SimilarityOps.pqTopKReranked(t(s, dir, "embeddings"))
        .orderBy(col("query_id"), col("rnk")),
    Some(pqAdcCtes(8, 4) + s""",
      pool AS (
        SELECT query_id, vec_id FROM pqranked WHERE rnk <= 50),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, en AS qn
        FROM base WHERE vec_id >= 8 AND vec_id < 12),
      rescored AS (
        SELECT p.query_id, p.vec_id,
          (${dotSql("q_emb", "embedding", 64)}) / (q.qn * b.en) AS cos
        FROM pool p
        JOIN base b ON b.vec_id = p.vec_id
        JOIN q ON q.query_id = p.query_id),
      rr AS (
        SELECT query_id, vec_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        FROM rescored)
      SELECT query_id, vec_id AS neighbor_id, rnk, cos
      FROM rr WHERE rnk <= 5
      ORDER BY query_id, rnk"""))

  // -------------------------------------------------------------- doc09
  // Top distinctive terms per document (TF-IDF shape). The inverse-
  // document-frequency weight is N/df in exact double division rather
  // than ln((N+1)/(df+1)) — same ordering for ranking, but IEEE-exact
  // and engine-portable (libm log differs across platforms; NOTES
  // oracle contract). Scale shape: one shuffle for tf, one for df,
  // then a term-keyed join (vocab-sized right side broadcasts; at
  // 100 TB it degrades to a co-partitioned shuffle join) and a 1-row
  // broadcast for N — the q20 scalar-subquery pattern.
  private val doc09 = GraftQuery(
    "doc09_top_terms",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val toks = docs.select($"doc_id",
        explode(TextFunctions.tokens($"text")).as("term"))
        .filter($"term" =!= "")
      val tf = toks.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
      val dfreq = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          $"tf".cast("double") *
            ($"n_docs".cast("double") / $"df".cast("double")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"score".desc, $"term")
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"score")
        .orderBy($"doc_id", $"rnk")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(TRIM(text), ' ')) AS term
        FROM documents),
      toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks2 GROUP BY doc_id, term),
      dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks2 GROUP BY term),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
          CAST(tf.tf AS DOUBLE)
            * (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tf, df, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS BIGINT) AS rnk
        FROM scored)
      SELECT doc_id, rnk, term, tf, df, score
      FROM ranked WHERE rnk <= 3
      ORDER BY doc_id, rnk"""))

  // -------------------------------------------------------------- doc07
  // Rolling-hash fingerprint (native codegen expression) — the
  // production-speed dedup key. The DuckDB oracle replays the
  // h=h*31+byte loop via list_reduce (see rollingHashCte), so the
  // custom Expression's codegen path is hash-checked end to end.
  private val doc07 = GraftQuery(
    "doc07_rolling_fingerprint",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          graft.functions.VectorExpressions.text_rolling_hash($"text")
            .as("rhash"))
        .groupBy($"rhash")
        .agg(min($"doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))
        .orderBy($"rhash")
    },
    Some(s"""
      WITH $rollingHashCte
      SELECT rhash, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
      FROM fp
      GROUP BY rhash
      ORDER BY rhash"""))

  // -------------------------------------------------------------- emb07
  // Scalar int8 quantization of embeddings (min-max per vector) — the
  // storage-compression step before ANN serving (4× smaller than
  // float32). floor() keeps every op IEEE-exact (round() ties differ
  // across engines); the oracle replays per-element arithmetic and the
  // quantized checksum.
  private val emb07 = GraftQuery(
    "emb07_int8_quantize",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id",
          array_min($"embedding").cast("double").as("mn"),
          array_max($"embedding").cast("double").as("mx"))
        .join(t(s, dir, "embeddings"), Seq("vec_id"))
        .select($"vec_id", $"mn", $"mx",
          aggregate(
            transform($"embedding", v =>
              floor((v.cast("double") - $"mn") / ($"mx" - $"mn") * 255)
                .cast("long")),
            lit(0L), (acc, x) => acc + x).as("qsum"))
        .orderBy($"vec_id")
    },
    Some("""
      WITH mm AS (
        SELECT vec_id,
          CAST(list_min(embedding) AS DOUBLE) AS mn,
          CAST(list_max(embedding) AS DOUBLE) AS mx
        FROM embeddings),
      ex AS (
        SELECT e.vec_id, mm.mn, mm.mx,
          CAST(unnest(e.embedding) AS DOUBLE) AS v
        FROM embeddings e JOIN mm ON e.vec_id = mm.vec_id)
      SELECT vec_id, mn, mx,
        CAST(SUM(CAST(FLOOR((v - mn) / (mx - mn) * 255) AS BIGINT))
             AS BIGINT) AS qsum
      FROM ex
      GROUP BY vec_id, mn, mx
      ORDER BY vec_id"""))

  // -------------------------------------------------------------- doc11
  // Text normalization: the canonicalization pass every dedup/tokenize
  // stage sits behind — lowercase, strip non-alphanumerics to spaces,
  // collapse runs, trim. Emitting the normalized fingerprint shows the
  // usual effect: normalization merges formatting variants.
  private val doc11 = GraftQuery(
    "doc11_normalize",
    (s, dir) => {
      import s.implicits._
      val norm = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", " "),
        " +", " "))
      t(s, dir, "documents")
        .select($"doc_id", norm.as("norm_text"),
          length(norm).as("n_norm_chars"),
          md5(norm.cast("binary")).as("norm_fp"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        CAST(LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT)
          AS n_norm_chars,
        md5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_fp
      FROM documents
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- mm03
  // Frame-sampling + resize planning: evenly spaced frame indices and
  // aspect-preserving integer resize over the (stub-decoded) media
  // dimensions — fully declarative (no UDF), oracle replays the
  // arithmetic incl. the sampled-index list.
  private val mm03 = GraftQuery(
    "mm03_frame_sample",
    (s, dir) => {
      import s.implicits._
      MultimodalOps.sampleAndResizePlan(
        MultimodalOps.toMediaColumns(t(s, dir, "documents")))
        .select($"doc_id", $"n_frames", $"frame_step",
          array_join($"sampled_frames", ",").as("frames_csv"),
          $"src_w", $"src_h", $"out_w", $"out_h")
        .orderBy($"doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents),
      d AS (
        SELECT doc_id, n,
          n % 640 AS w, (n * 7) % 480 AS h,
          n // 1000 + 1 AS n_frames
        FROM m),
      s AS (
        SELECT *, GREATEST(1, (n_frames + 7) // 8) AS step,
          GREATEST(GREATEST(w, h), 1) AS longest
        FROM d)
      SELECT doc_id, n_frames, step AS frame_step,
        array_to_string(list_transform(
          range(0, CAST((n_frames - 1) // step + 1 AS BIGINT)),
          i -> i * step), ',') AS frames_csv,
        w AS src_w, h AS src_h,
        w * 224 // longest AS out_w,
        h * 224 // longest AS out_h
      FROM s
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- emb13
  // IVF-PQ: coarse inverted-file cells (8 centroids, cosine) + product
  // quantization of RESIDUALS (vector − cell centroid) — the composed
  // two-level index of the FAISS IVFx,PQy family. Queries 12-15 probe
  // their 2 nearest cells; in-cell candidates rank by residual ADC
  // (code lookups only — raw floats never read in the scan). The
  // oracle replays coarse assignment, float32 residuals, the shared
  // sub-codebook (residuals of vecs 8-11; centroid rows have zero
  // residuals), encode argmin, and the per-cell distance tables.
  private val emb13: GraftQuery = {
    val adcSum = (0 until 8).map(i =>
      s"COALESCE(MAX(CASE WHEN sm = $i THEN d END), 0.0)")
      .reduceLeft((acc, t) => s"($acc + $t)")
    GraftQuery(
      "emb13_ivfpq",
      (s, dir) =>
        SimilarityOps.ivfPqTopK(t(s, dir, "embeddings"))
          .orderBy(col("query_id"), col("rnk")),
      Some(s"""
      WITH cent AS (
        SELECT vec_id AS cell, embedding AS ce,
               ${normSql("embedding", 64)} AS cn
        FROM embeddings WHERE vec_id < 8),
      base AS (
        SELECT vec_id, embedding, ${normSql("embedding", 64)} AS en
        FROM embeddings),
      ranked AS (
        SELECT b.vec_id, b.embedding, c.cell, c.ce,
          ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
            (${dotSql("b.embedding", "c.ce", 64)})
              / (b.en * c.cn) DESC, c.cell) AS rn
        FROM base b CROSS JOIN cent c),
      resid AS (
        SELECT vec_id, cell,
          list_transform(range(1, 65), i -> embedding[i] - ce[i])
            AS resid
        FROM ranked WHERE rn = 1),
      ms AS (SELECT unnest(range(0, 8)) AS m),
      cb AS (
        SELECT r.vec_id - 8 AS cid, ms.m,
          list_slice(r.resid, ms.m*8 + 1, ms.m*8 + 8) AS ce
        FROM resid r CROSS JOIN ms
        WHERE r.vec_id >= 8 AND r.vec_id < 12),
      rsub AS (
        SELECT r.vec_id, r.cell, ms.m,
          list_slice(r.resid, ms.m*8 + 1, ms.m*8 + 8) AS sv
        FROM resid r CROSS JOIN ms),
      dist AS (
        SELECT s.vec_id, s.cell, s.m, cb.cid,
          ((${dotSql("sv", "sv", 8)})
            - 2.0*(${dotSql("sv", "ce", 8)})
            + (${dotSql("ce", "ce", 8)})) AS d
        FROM rsub s JOIN cb ON cb.m = s.m),
      codes AS (
        SELECT vec_id, cell, m, cid AS code FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                      ORDER BY d, cid) AS rn
          FROM dist)
        WHERE rn = 1),
      qres AS (
        SELECT vec_id AS query_id, cell,
          list_transform(range(1, 65), i -> embedding[i] - ce[i])
            AS qres
        FROM ranked
        WHERE vec_id >= 12 AND vec_id < 16 AND rn <= 2),
      qsub AS (
        SELECT query_id, cell, ms.m,
          list_slice(qres, ms.m*8 + 1, ms.m*8 + 8) AS sv
        FROM qres CROSS JOIN ms),
      qdt AS (
        SELECT q.query_id, q.cell, q.m, cb.cid,
          ((${dotSql("sv", "sv", 8)})
            - 2.0*(${dotSql("sv", "ce", 8)})
            + (${dotSql("ce", "ce", 8)})) AS d
        FROM qsub q JOIN cb ON cb.m = q.m),
      partials AS (
        SELECT q.query_id, c.vec_id, c.m AS sm, q.d
        FROM codes c
        JOIN qdt q ON q.cell = c.cell AND q.m = c.m AND q.cid = c.code
        WHERE c.vec_id <> q.query_id),
      adc AS (
        SELECT query_id, vec_id, $adcSum AS adc
        FROM partials GROUP BY query_id, vec_id),
      pqranked AS (
        SELECT query_id, vec_id, adc,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adc, vec_id) AS BIGINT) AS rnk
        FROM adc)
      SELECT query_id, vec_id AS neighbor_id, rnk, adc
      FROM pqranked WHERE rnk <= 5
      ORDER BY query_id, rnk"""))
  }

  // -------------------------------------------------------------- mm04
  // Overlapped byte-range chunk plan: each payload splits into 128-B
  // chunks overlapping by 32 (sharding before parallel decode of
  // blobs too big for one task; the overlap keeps boundary-crossing
  // feature windows whole). Pure integer codegen; the oracle replays
  // the ceil-division chunk count and the range arithmetic.
  private val mm04 = GraftQuery(
    "mm04_chunk_plan",
    (s, dir) => {
      import s.implicits._
      MultimodalOps.chunkPlan(
          MultimodalOps.toMediaColumns(t(s, dir, "documents")),
          chunkBytes = 128, overlapBytes = 32)
        .orderBy($"doc_id", $"chunk_id")
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
        FROM c)
      SELECT doc_id, chunk_id,
        chunk_id * 96 AS byte_start,
        LEAST(128, n - chunk_id * 96) AS byte_len,
        chunk_id = n_chunks - 1 AS is_last
      FROM e
      ORDER BY doc_id, chunk_id"""))

  val all: Seq[GraftQuery] =
    Seq(doc01, doc02, doc03, doc04, doc05, doc06, doc07, doc08, doc09,
      doc10, doc11, doc17, doc18, doc19, emb01, emb02, emb03, emb04,
      emb05, emb06, emb07, emb11, emb12, emb13, mm01, mm02, mm03, mm04)
}
