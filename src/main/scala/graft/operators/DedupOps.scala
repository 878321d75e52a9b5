package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions._

/** Deduplication operators for LLM-training-data pipelines: exact,
  * MinHash+LSH near-dup, SimHash. Designed scale-first:
  *
  *  - exact dedup = hash-groupBy (one shuffle on the fingerprint);
  *  - MinHash signatures are one groupBy over exploded shingles with
  *    map-side partial min() — the shuffle carries k hashes per doc,
  *    not the shingle set;
  *  - LSH banding turns O(n²) pair search into an equi-join on band
  *    keys (shuffle co-partitioned both sides); only candidates inside
  *    a bucket are verified, so work scales with collisions, not n²;
  *  - skew note: a degenerate band key (many docs, e.g. empty docs)
  *    would hot-spot one reducer — AQE skew-join handles it, and empty
  *    shingle sets are filtered before banding.
  */
object DedupOps {

  /** MinHash permutation-hash scheme.
    *
    *  - [[HashScheme.FastMix]] (default): native codegen'd
    *    seeded-poly31+fmix64 longs computed INLINE per shingle
    *    occurrence — one multiply-add per byte, 8-byte shuffle rows,
    *    and a single map-side-combined min shuffle. The 100 TB shape.
    *  - [[HashScheme.Md5Vocab]]: md5 hex strings, amortized by hashing
    *    each DISTINCT shingle once and joining back. Portable (md5 is
    *    everywhere), but pays a distinct shuffle + join and 32-char
    *    string minima; kept for cross-engine reproducibility.
    */
  sealed trait HashScheme
  object HashScheme {
    case object FastMix extends HashScheme
    case object Md5Vocab extends HashScheme
  }

  /** Frames persisted by [[verifiedNearDupsFrom]] for intra-plan reuse.
    * The cache must OUTLIVE the call (the returned DataFrame is lazy;
    * the persist pays off when the caller's single action hits the
    * shingle subtree three times), so lifecycle is a caller-visible
    * drain: run the action, then [[unpersistShingleCaches]]. Bench,
    * ScaleProbe and the demos do exactly that — without it, repeated
    * calls in one session accumulate 3-5× input in cache until LRU
    * churn. */
  private val liveCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every shingle cache registered since the last drain;
    * returns how many were released. Safe to call any time — caches
    * re-materialize transparently if a held DataFrame is re-executed. */
  def unpersistShingleCaches(blocking: Boolean = false): Int = {
    var n = 0
    var df = liveCaches.poll()
    while (df != null) {
      df.unpersist(blocking); n += 1; df = liveCaches.poll()
    }
    n
  }

  /** Exact dedup groups: one row per distinct content fingerprint with
    * the surviving (minimum) id and the duplicate count. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Exploded distinct (doc_id, shingle) pairs. Tokens materialize in
    * their own projection so the shingle lambda reads a bound array
    * reference instead of re-splitting the text per bigram. */
  def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(bigramShinglesFromTokens(col("toks"))).as("shingle"))

  /** Exploded distinct (doc_id, `w`-word shingle) pairs — the
    * generalized shingle unit ([[graft.functions.TextFunctions.wordGramsFromTokens]])
    * for operators whose discriminative power needs a LONGER n-gram
    * than the MinHash bigram (containment, contamination matching:
    * published decontamination pipelines match 8-13-grams for
    * exactly this reason — w-gram vocabulary grows ~|vocab|^w, so
    * df per shingle FALLS as w rises and rarity survives corpus
    * growth). */
  def docWordGrams(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(wordGramsFromTokens(col("toks"), w)).as("shingle"))

  /** Exploded distinct (doc_id, char-trigram) pairs — the character
    * n-gram dedup unit ([[graft.functions.TextFunctions.charTrigrams]]). */
  def docCharTrigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(charTrigrams(col("text"))).as("shingle"))

  /** MinHash signature: k seeded min-hashes per doc. See [[HashScheme]]
    * for the two permutation-hash strategies. */
  def minhashSignature(docs: DataFrame, k: Int = 8,
      scheme: HashScheme = HashScheme.FastMix): DataFrame =
    signatureWithExtras(docShingles(docs), k, Nil, scheme)

  /** Signature-and-extras core: per-doc minima of the k seeded hashes
    * (+ any extra aggregates computed in the same pass).
    *
    * FastMix hashes inline — a cheap hash makes per-occurrence
    * recomputation essentially free, so the whole signature is ONE
    * groupBy with map-side partial min (no distinct, no join).
    * Md5Vocab hashes each DISTINCT shingle once and joins back
    * (k·|vocab| digests instead of k·|corpus|); Catalyst/AQE
    * broadcasts a small vocabulary, degrading to a co-partitioned
    * shuffle join when it is huge. */
  private def signatureWithExtras(sh: DataFrame, k: Int,
      extras: Seq[org.apache.spark.sql.Column],
      scheme: HashScheme): DataFrame = scheme match {
    case HashScheme.FastMix =>
      val aggs = (0 until k).map(s =>
        min(graft.functions.VectorExpressions
          .seeded_mix_hash(s, col("shingle"))).as(s"h$s")) ++ extras
      sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    case HashScheme.Md5Vocab =>
      val hashCols = (0 until k).map(s =>
        seededHash(s, col("shingle")).as(s"sh$s"))
      val vocab = sh.select("shingle").distinct()
        .select(col("shingle") +: hashCols: _*)
      val aggs = (0 until k).map(s => min(col(s"sh$s")).as(s"h$s")) ++ extras
      sh.join(vocab, Seq("shingle"))
        .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: rows of (doc_id, band, key) where key joins the
    * `rowsPerBand` consecutive signature components verbatim — an
    * equi-join on raw values needs no re-hash (the old md5-of-concat
    * key bought nothing but digest cost; collisions on the raw pair
    * and on its md5 are the same event). */
  def lshBands(sig: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws(",", parts: _*).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs from LSH bucket collisions (a < b, distinct). */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Verify candidates with true shingle Jaccard; keep pairs ≥ minJ.
    * Set sizes join via two broadcast-able aggregates; the intersection
    * count is a co-partitioned join on the shingle. */
  def verifiedNearDups(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      minJ: Double = 0.2,
      scheme: HashScheme = HashScheme.FastMix): DataFrame =
    verifiedNearDupsFrom(docShingles(docs), k, rowsPerBand, minJ, scheme)

  /** The MinHash→LSH→verify pipeline over ANY exploded
    * (doc_id, shingle) set — word bigrams ([[verifiedNearDups]]),
    * char trigrams ([[docCharTrigrams]]), or a caller-defined unit.
    *
    * `maxDocFrac` < 1 enables the stop-shingle filter: shingles
    * present in more than that fraction of documents are dropped
    * before signatures. A high-df shingle carries no discrimination
    * signal but dominates MinHash minima, which collapses band keys
    * and makes the candidate set QUADRATIC — measured 200+ seconds at
    * sf0.1 for char trigrams over the small-vocabulary corpus vs ~2s
    * filtered. The filter costs one vocab-sized aggregation and a
    * join back; at 100 TB it is what keeps candidates ∝ true dups.
    */
  def verifiedNearDupsFrom(shinglesRaw: DataFrame, k: Int = 8,
      rowsPerBand: Int = 2, minJ: Double = 0.2,
      scheme: HashScheme = HashScheme.FastMix,
      maxDocFrac: Double = 1.0): DataFrame = {
    // The shingle explosion feeds three consumers (signature agg, and
    // both sides of the intersection join). Persist it once rather
    // than re-deriving it three times — MEASURED at sf0.1: uncached
    // char-trigram steady state is 7.9s vs 3.3s cached (the explode +
    // df-filter recompute triples the dominant cost); the serialized
    // MEMORY_AND_DISK_SER copy spills gracefully when the shingle set
    // outgrows executor memory at large SF. GRAFT_DEDUP_NOCACHE=true
    // opts out for cache-pressure-bound clusters where re-scanning
    // compressed parquet beats churning a 3-5×-input cache.
    def maybePersist(df: DataFrame): DataFrame =
      if (sys.env.get("GRAFT_DEDUP_NOCACHE").contains("true")) df
      else {
        val p = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        liveCaches.add(p)
        p
      }
    val exploded = maybePersist(shinglesRaw)
    val shingles =
      if (maxDocFrac >= 1.0) exploded
      else {
        // rows are distinct (doc, shingle), so count(*) per shingle IS
        // document frequency. The threshold compare runs on the TINY
        // vocab side (df table ⋈ 1-row doc count), producing a stop
        // list that broadcast-anti-joins against the big exploded set —
        // the corpus-sized side sees exactly one broadcast hash lookup,
        // no extra operators.
        val nDocs = exploded
          .agg(countDistinct(col("doc_id")).as("nd"))
        val stopShingles = exploded.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("df") > col("nd") * maxDocFrac)
          .select("shingle")
        maybePersist(
          exploded.join(broadcast(stopShingles), Seq("shingle"), "left_anti"))
      }
    // signature AND set size in ONE aggregation pass over the hashed
    // shingles (the shingle subtree is recomputed per consumer
    // otherwise — measured win at sf0.1).
    val sigAndSize =
      signatureWithExtras(shingles, k, Seq(count(lit(1)).as("n")), scheme)
    val sizes = sigAndSize.select(col("doc_id"), col("n"))
    val cands = lshCandidates(lshBands(sigAndSize, k, rowsPerBand))
    // Intersection counts: attach doc_a's shingles to each candidate
    // pair, then equi-join on (doc_b, shingle). Joining candidates FIRST
    // keeps the work proportional to |candidates|·|shingles per doc|; a
    // raw shingle×shingle self-join would blow up quadratically on
    // frequent shingles (with a 31-word vocab that's ~32M rows at sf0.1).
    val sa = shingles.select(col("doc_id").as("doc_a"), col("shingle"))
    val sb = shingles.select(col("doc_id").as("doc_b"), col("shingle"))
    val interCount = cands
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    interCount
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** True-Jaccard verification of an EXTERNALLY-supplied candidate
    * pair list against the shingle set — the verify stage of
    * [[verifiedNearDupsFrom]] for callers that produce candidates
    * elsewhere (the incremental LSH index, a cross-corpus probe).
    * Same candidates-first join shape: work ∝ |candidates| · shingles
    * per doc, never shingle×shingle. */
  def verifyPairs(shinglesRaw: DataFrame, cands: DataFrame,
      minJ: Double): DataFrame = {
    // the shingle explosion feeds three subtrees of ONE action (sizes,
    // both intersection sides) whose differing aliases defeat exchange
    // reuse — persist it once, drained by the caller's
    // unpersistShingleCaches like every other shingle cache (measured
    // in the r17 cdc54 probe: the explosion ran 3x per serve)
    val shingles =
      if (sys.env.get("GRAFT_DEDUP_NOCACHE").contains("true"))
        shinglesRaw
      else {
        val p = shinglesRaw.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        liveCaches.add(p)
        p
      }
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sa = shingles.select(col("doc_id").as("doc_a"), col("shingle"))
    val sb = shingles.select(col("doc_id").as("doc_b"), col("shingle"))
    cands.select("doc_a", "doc_b")
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** Shingle-CONTAINMENT pairs — the asymmetric complement to
    * [[verifiedNearDups]]: detects near-SUPERSET relations (a quote,
    * a syndicated snippet, a doc embedded inside a larger one), which
    * symmetric Jaccard structurally misses — a 10-shingle doc fully
    * contained in a 200-shingle doc has J ≈ 0.05, far below any
    * near-dup threshold, but containment 1.0. Emits ORDERED rows
    * (doc_a contained in doc_b): containment(a→b) = |A∩B| / |A| as
    * truncating integer ppm (float-free, the doc23 doctrine),
    * thresholded at `minContain` with `minShingles` guarding the
    * degenerate tiny-set case (any 1-shingle doc is "contained" in
    * everything sharing that shingle).
    *
    * Containment is measured over DISCRIMINATIVE shingles only —
    * those in ≤ `maxDf` documents corpus-wide. A shingle shared by
    * thousands of documents carries no evidence that one specific
    * document quotes another (this is how rare-n-gram contamination
    * matching defines signal), and the cap is also what bounds the
    * work. The shingle is a `shingleW`-word gram (default 3, vs the
    * MinHash bigram): w-gram vocabulary grows ~|vocab|^w, so per-
    * shingle df FALLS as w rises — the lever that keeps a FIXED
    * absolute df cap discriminative as the corpus grows (measured on
    * the degenerate-vocab corpus: at 10× scale only 31/931 bigrams
    * stay under df 100 and recall collapses to zero, while all 27k
    * trigrams stay rare and every doc keeps signal; published
    * decontamination pipelines match 8-13-grams for the same
    * reason). Candidates come from the rare-shingle INVERTED INDEX (not
    * MinHash bands — LSH on symmetric Jaccard cannot surface the
    * low-J containment pairs that are the point), narrowed by the
    * PPJoin-style PREFIX filter: containment(a→b) ≥ t means b misses
    * at most ⌊(1−t)·n_a⌋ of a's kept shingles, so at least one of
    * a's ⌊(1−t)·n_a⌋+1 RAREST kept shingles (order by (df, shingle)
    * — deterministic) must occur in b; only those prefix rows probe
    * the index, which is lossless for the threshold. Candidate volume
    * ≤ prefix rows · maxDf — LINEAR in corpus shingles with maxDf
    * constant, measured 43.5 s → ~1 s at sf0.1 on the degenerate-
    * vocabulary corpus (where a relative df cap bounds nothing).
    * Verification is the candidates-first intersection join
    * ([[verifyPairs]] shape). Per-doc rank window is partitioned by
    * doc_id (bounded groups); nothing driver-side; shingle caches
    * drain via [[unpersistShingleCaches]]. */
  def containmentPairs(docs: DataFrame, minContain: Double = 0.8,
      minShingles: Int = 3, maxDf: Long = 100L,
      shingleW: Int = 3): DataFrame = {
    val minPpm = (minContain * 1000000).round
    val exploded = docWordGrams(docs, shingleW)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    liveCaches.add(exploded)
    val dfreq = exploded.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val sh = exploded.join(dfreq, Seq("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    liveCaches.add(sh)
    containmentFromKept(sh, minPpm, minShingles)
  }

  /** The prefix-filter + verify pipeline over an ALREADY df-capped
    * kept-shingle frame (doc_id, shingle, df) — shared between the
    * one-shot [[containmentPairs]] (which builds and caches the kept
    * rows from raw docs) and the maintained index
    * ([[graft.streaming.IncrementalContainment]], which serves them
    * from its postings grid with df recomputed at read time —
    * recomputation, not a maintained prefix table, because a doc's
    * prefix is df-ORDER-dependent and df drifts as the corpus grows:
    * a frozen prefix chosen under yesterday's df can silently lose
    * the lossless-filter guarantee once shingles it skipped fall out
    * of the kept set). */
  private[graft] def containmentFromKept(sh: DataFrame, minPpm: Long,
      minShingles: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val wPfx = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    val prefix = sh
      .withColumn("rnk", row_number().over(wPfx))
      .join(sizes, Seq("doc_id"))
      .filter(col("rnk") <=
        expr(s"((${1000000L - minPpm} * n) div 1000000) + 1"))
      .select(col("doc_id").as("doc_a"), col("shingle"))
    val cands = prefix
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    cands
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .filter(col("n_a") >= minShingles)
      .withColumn("containment_ppm",
        expr("(n_inter * 1000000) div n_a"))
      .filter(col("containment_ppm") >= minPpm)
      .select("doc_a", "doc_b", "n_inter", "n_a", "containment_ppm")
  }

  /** Sketch-accuracy audit: for every LSH candidate pair, the MinHash
    * Jaccard ESTIMATE (matching signature components out of `k`) next
    * to the exact shingle Jaccard — the calibration a dedup rollout
    * runs before trusting the sketch at full corpus scale, where
    * exact verification of every pair is the cost being avoided. The
    * output is all-integer (the doc23 float-free doctrine): match
    * count, intersection/union sizes, and both ratios as truncating
    * parts-per-million, plus their absolute error. Shape: the
    * signature pass and candidate join are exactly [[verifiedNearDups]]'s
    * (one groupBy + bucket join, never all-pairs); the per-pair audit
    * joins signatures (k small ints per doc) and the candidates-first
    * intersection count. */
  def minhashAccuracy(docs: DataFrame, k: Int = 8,
      rowsPerBand: Int = 2): DataFrame = {
    val sh = docShingles(docs).distinct()
    val sig = signatureWithExtras(sh, k, Seq(count(lit(1)).as("n")),
      HashScheme.FastMix)
    val cands = lshCandidates(lshBands(sig, k, rowsPerBand))
    val sa = sig.select(col("doc_id").as("doc_a") +:
      col("n").as("n_a") +:
      (0 until k).map(i => col(s"h$i").as(s"ha$i")): _*)
    val sb = sig.select(col("doc_id").as("doc_b") +:
      col("n").as("n_b") +:
      (0 until k).map(i => col(s"h$i").as(s"hb$i")): _*)
    val matchK = (0 until k).map(i =>
      when(col(s"ha$i") === col(s"hb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val inter = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    cands
      .join(inter, Seq("doc_a", "doc_b")) // zero-overlap cands drop
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("match_k", matchK)
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("est_ppm", expr(s"match_k * 1000000 div $k"))
      .withColumn("true_ppm", expr(
        "CAST(n_inter AS DECIMAL(38,0)) * 1000000 div n_union"))
      .withColumn("err_ppm", abs(col("est_ppm") - col("true_ppm")))
      .select("doc_a", "doc_b", "match_k", "n_inter", "n_union",
        "est_ppm", "true_ppm", "err_ppm")
  }

  /** 16-bit SimHash from the hex digits of per-token md5: bit i set when
    * the majority of token hashes have the top bit of nibble i set. */
  def simhash(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("h", md5(col("w").cast("binary")))
    val bitAggs = (1 to 16).map { i =>
      when(sum(when(substring(col("h"), i, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)) > 0,
        "1").otherwise("0")
    }
    words.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        concat(bitAggs: _*).as("simhash"))
  }

  /** Connected components over an undirected pair list — the step that
    * turns near-dup PAIRS ([[verifiedNearDups]]) into canonical dup
    * CLUSTERS, so "keep one representative per cluster" becomes a
    * single groupBy. Returns (doc_id, component) where component is
    * the cluster's minimum doc_id.
    *
    * Algorithm: distributed min-label propagation — each round every
    * node takes the min of its own label and its neighbors' labels,
    * one shuffle join + one partial-aggregated groupBy per round,
    * converging in O(cluster diameter) rounds. Dedup clusters are
    * near-cliques (every member pairs with most others), so diameter
    * is small and 2–3 rounds settle real corpora; `maxIter` bounds the
    * pathological chain. Each round localCheckpoints the label table:
    * without it the loop's lineage doubles per round and the job DAG —
    * not the data — becomes the scale limit.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // ck is the bare checkpointed frame each round (so its blocks can
    // be freed the moment the next round supersedes it — see
    // CheckpointBridge: leaked per-round checkpoints measured as 2-4×
    // inflation of unrelated downstream queries in a full sweep).
    var ck = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var labels = ck
    val idType = ck.schema("comp").dataType
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; min over (self ∪ neighbors).
      // Self rows carry the node's previous label in `prev`, so the
      // SAME aggregate that computes the new label also reports
      // whether it changed — convergence is then a filter scan over
      // the freshly checkpointed blocks, not a per-round diff join.
      val next = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("comp", "ncomp"), "dst")
        .select(col("src").as("node"), col("ncomp").as("comp"),
          lit(null).cast(idType).as("prev"))
        .unionByName(labels.select(col("node"), col("comp"),
          col("comp").as("prev")))
        .groupBy("node").agg(min("comp").as("comp"),
          max("prev").as("prev"))
        .localCheckpoint()
      // labels only ever decrease: changed ⇔ comp < prev
      converged = next.filter(col("comp") < col("prev")).isEmpty
      CheckpointBridge.freeLocalCheckpoint(ck)
      ck = next
      labels = next.select("node", "comp")
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("node").as("doc_id"), col("comp").as("component"))
  }

  /** End-to-end dedup: keep ONE representative per near-dup cluster
    * (plus every unpaired document untouched). `prefer` orders each
    * cluster's members best-first (e.g. longest text, then lowest id
    * as the deterministic tiebreak); rank 1 survives. The join with
    * the cluster labels is broadcast-able in practice — the label
    * table is paired-docs-sized, a small fraction of the corpus —
    * while the corpus side stays a single pass — left to AQE rather
    * than hinted, so a billion-pair corpus degrades to a shuffle join
    * instead of an executor OOM. */
  def dedupKeepRepresentative(docs: DataFrame, pairs: DataFrame,
      prefer: Seq[Column]): DataFrame = {
    val comps = connectedComponents(pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(prefer: _*)
    docs
      .join(comps, Seq("doc_id"), "left_outer")
      .withColumn("component",
        coalesce(col("component"), col("doc_id")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Corpus vocabulary with term frequency: one exploded-token
    * groupBy (map-side combined), empty tokens dropped. The input to
    * [[fuzzyVocabPairs]] — at 100 TB the vocabulary is heavy-tailed
    * but still ~10⁷–10⁸ DISTINCT rows, i.e. corpus-sublinear: every
    * downstream fuzzy step runs on this table, never on the corpus. */
  def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("tf"))

  /** Symmetric-delete (SymSpell) blocking index: every string
    * obtainable from `word` by deleting up to `maxEdit` characters
    * (including the word itself, the 0-deletion variant). The classic
    * lossless blocking key for edit distance: two words within
    * Damerau/Levenshtein distance d ≤ maxEdit always share at least
    * one ≤maxEdit-deletion variant, so an EQUI-join on `variant`
    * yields a candidate superset and the quadratic all-pairs scan is
    * never run. Index size is O(V · L^maxEdit) rows (L ≈ word length;
    * ~1+L+L(L−1)/2 variants per word at maxEdit=2) — vocabulary-
    * bounded, corpus-independent.
    *
    * Skew note (the doc10/doc36 df doctrine): very short words
    * collapse into short/empty variants — the "" bucket holds every
    * word of length ≤ maxEdit, a 1-char variant bucket every word one
    * delete away from it. Those buckets are bounded by the ALPHABET
    * (≤ |Σ|^maxEdit words can be that short), not the vocabulary, so
    * no df cap is needed for losslessness; candidates are still
    * post-verified exactly. Deletions use i < j positions applied
    * right-to-left so earlier indices stay valid. */
  def deletionVariants(vocabDf: DataFrame, maxEdit: Int = 2): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2,
      "symmetric-delete blocking supports maxEdit 1 or 2")
    val base = vocabDf
      .withColumn("L", length(col("word")).cast("int"))
      .withColumn("i", explode(expr("sequence(-1, L - 1)")))
    val withJ =
      if (maxEdit == 1) base.withColumn("j", lit(-1))
      else base
        .withColumn("j", explode(expr("sequence(i, L - 1)")))
        .filter(col("j") > col("i") ||
          (col("i") === -1 && col("j") === -1))
    withJ
      .withColumn("vj",
        when(col("j") < 0, col("word"))
          .otherwise(concat(expr("substring(word, 1, j)"),
            expr("substring(word, j + 2)"))))
      .withColumn("variant",
        when(col("i") < 0, col("vj"))
          .otherwise(concat(expr("substring(vj, 1, i)"),
            expr("substring(vj, i + 2)"))))
      .select(col("word"), col("variant"))
      .distinct()
  }

  /** Fuzzy vocabulary matching — every pair of corpus words within
    * Levenshtein distance `maxEdit`, with both term frequencies: the
    * OCR-confusable / typo-variant audit that complements the shingle
    * (doc04/doc10/doc36) and embedding (emb27) dedup ladders at the
    * TOKEN grain, where shingling has no signal (a 1-char typo shares
    * no word-grain shingles with its correction and embeds nowhere
    * near it in a count-based space).
    *
    * Shape: [[vocab]] (corpus-sublinear) → [[deletionVariants]]
    * self-equi-join on `variant` (the SymSpell lossless candidate
    * superset — never all-pairs) → exact `levenshtein` verification
    * on candidates only → tf join-back. All-integer output; the
    * levenshtein verifier is Spark's codegen'd built-in, and the
    * candidate count is bounded by variant-bucket collisions (true
    * matches + the alphabet-bounded short-word buckets), not V². */
  def fuzzyVocabPairs(docs: DataFrame, maxEdit: Int = 2): DataFrame = {
    val v = vocab(docs)
    val variants = deletionVariants(v.select("word"), maxEdit)
    val cands = variants.as("a")
      .join(variants.as("b"), Seq("variant"))
      .filter(col("a.word") < col("b.word"))
      .select(col("a.word").as("word_a"), col("b.word").as("word_b"))
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col("word_a"), col("word_b")).cast("long"))
      .filter(col("dist") <= maxEdit)
      .join(v.select(col("word").as("word_a"), col("tf").as("tf_a")),
        Seq("word_a"))
      .join(v.select(col("word").as("word_b"), col("tf").as("tf_b")),
        Seq("word_b"))
      .select(col("word_a"), col("word_b"), col("dist"),
        col("tf_a"), col("tf_b"))
  }

  /** EXACT REPEATED-SPAN detection — the exact-substring dedup of
    * Lee et al.'s "Deduplicating Training Data Makes Language Models
    * Better" (arXiv:2107.06499), at token grain: every `spanLen`-token
    * window that occurs in ≥ 2 DISTINCT documents is reported at
    * every occurrence (doc_id, pos) — the deletion-candidate list an
    * exact-substring dedup pass consumes. This is the memorization
    * killer the doc-level ladder (doc01 exact, doc04 MinHash, doc36
    * containment) cannot express: two documents sharing one
    * boilerplate paragraph are NOT near-dups, but the paragraph
    * itself is still trained on twice.
    *
    * Span identity is the md5 of the space-joined window (exact,
    * cross-engine replayable — the suffix-array construction of the
    * paper is a single-machine algorithm; hashed windows are the
    * shuffle-native equivalent, exact up to md5 collisions).
    *
    * Shape at scale: one token projection → one window explosion
    * (∝ corpus tokens, the same budget every shingle operator pays)
    * → one map-side-combined (key → n_docs, n_occ) aggregate → one
    * keyed semi-join back. No windows, no broadcast, no driver
    * materialization; output ∝ repeated mass only.
    * Returns (doc_id, pos, span_key, n_docs, n_occ). */
  /** The raw (doc_id, pos, span_key) occurrence stream of every
    * `spanLen`-token window — the shared projection of
    * [[repeatedSpans]] (one-shot) and
    * [[graft.streaming.IncrementalSpans]] (maintained). */
  def spanOccurrences(docs: DataFrame, spanLen: Int): DataFrame = {
    require(spanLen >= 2, "a 1-token span is vocabulary, not a span")
    docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= spanLen)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("ts")) - (spanLen - 1)))
          .as("pos"), col("ts"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(concat_ws(" ",
          slice(col("ts"), col("pos"), lit(spanLen))).cast("binary"))
          .as("span_key"))
  }

  def repeatedSpans(docs: DataFrame, spanLen: Int = 8): DataFrame = {
    val spans = spanOccurrences(docs, spanLen)
    val repeated = spans.groupBy("span_key")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
    spans.join(repeated, Seq("span_key"))
      .select(col("doc_id"), col("pos"), col("span_key"),
        col("n_docs"), col("n_occ"))
  }

  /** Per-document REPEATED-SPAN COVERAGE — how much of each document
    * is boilerplate that also occurs elsewhere: the [[repeatedSpans]]
    * occurrences of a doc, merged as intervals [pos, pos+spanLen)
    * (the classic islands pattern: a span starting at or before the
    * running max end extends the island), reported as covered tokens
    * and truncating-ppm coverage of the doc's token count. The
    * quality gate this feeds: a 95%-covered document is a template
    * instance even though no single whole-doc fingerprint matches.
    *
    * Shape: [[repeatedSpans]] + one per-doc ordered window (groups
    * bounded by tokens/doc) + two aggregates; docs with no repeated
    * span report coverage 0 (left join keeps them).
    * Returns (doc_id, n_spans, n_islands, covered_tok, n_tok,
    * coverage_ppm). */
  /** Merge a (doc_id, pos) span-start stream into per-doc ISLANDS —
    * the interval union of [pos, pos+spanLen): a span starting at or
    * before the running max end extends the island. One per-doc
    * ordered window, groups bounded by tokens/doc. Shared by
    * [[spanCoverage]] (measures the islands) and [[cutSpans]] (cuts
    * them) so the gate and the cut can never disagree on island
    * semantics. Returns (doc_id, g, s, e, n_sp). */
  private def spanIslands(occurrences: DataFrame,
      spanLen: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    occurrences
      .select(col("doc_id"), col("pos"))
      .withColumn("prev_end", max(col("pos") + spanLen).over(prevEnd))
      .withColumn("flag",
        (col("prev_end").isNull || col("pos") > col("prev_end"))
          .cast("long"))
      .withColumn("g", sum(col("flag")).over(w))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + spanLen).as("e"),
        count(lit(1)).as("n_sp"))
  }

  def spanCoverage(docs: DataFrame, spanLen: Int = 8): DataFrame = {
    val islands = spanIslands(
      repeatedSpans(docs, spanLen).select(col("doc_id"), col("pos")),
      spanLen)
    val perDoc = islands.groupBy("doc_id")
      .agg(sum(col("n_sp")).as("n_spans"),
        count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("covered_tok"))
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("covered_tok"), lit(0L)).as("covered_tok"),
        col("n_tok"),
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr("(coalesce(covered_tok, 0L) * 1000000) " +
            "div n_tok")).as("coverage_ppm"))
  }

  /** REPEATED-SPAN REMOVAL — the final step of the Lee et al.
    * exact-substring recipe (arXiv:2107.06499 §3: delete every
    * duplicated substring occurrence): rewrite each document with its
    * repeated spans CUT OUT. [[repeatedSpans]] names the deletion
    * candidates, [[spanCoverage]] measures them; this operator
    * actually deduplicates the training data — the kept text is the
    * COMPLEMENT of the per-doc interval union (the same islands
    * [[spanCoverage]] merges), reassembled from the token stream.
    *
    * Shape at scale: the repeatedSpans budget (∝ corpus tokens) + one
    * per-doc ordered window (groups bounded by tokens/doc) + one
    * islands-per-doc collect_list (bounded by tokens/doc — a doc's
    * island list can never exceed its own token count) + one doc-keyed
    * left join; the cut itself is per-row higher-order functions
    * (filter/exists/transform over the token array), no explode back
    * to token grain and nothing driver-side. Docs with no repeated
    * span pass through verbatim (token-normalized: single-space
    * joined, the [[graft.functions.TextFunctions.tokens]] grain all
    * span operators share).
    *
    * Returns (doc_id, text_deduped, n_tok_removed). */
  def removeRepeatedSpans(docs: DataFrame,
      spanLen: Int = 8): DataFrame =
    cutSpans(docs,
      repeatedSpans(docs, spanLen).select(col("doc_id"), col("pos")),
      spanLen)

  /** The cut itself, factored so the one-shot ([[removeRepeatedSpans]])
    * and the maintained view
    * ([[graft.streaming.IncrementalSpans.removalView]]) share one
    * island/complement implementation: `occurrences` is the
    * (doc_id, pos) stream of span starts to delete — wherever it came
    * from — merged per doc into islands and cut out of the token
    * stream. */
  def cutSpans(docs: DataFrame, occurrences: DataFrame,
      spanLen: Int): DataFrame = {
    val islands = spanIslands(occurrences, spanLen)
    val ivs = islands.groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .join(ivs, Seq("doc_id"), "left_outer")
      .withColumn("ivs", coalesce(col("ivs"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
      // kept token positions = the complement of the interval union;
      // islands are disjoint so the exists() scan is ≤ islands/doc
      .withColumn("kp", filter(sequence(lit(1), size(col("ts"))),
        p => !exists(col("ivs"),
          iv => p >= iv("s") && p < iv("e"))))
      .select(col("doc_id"),
        concat_ws(" ",
          transform(col("kp"), p => element_at(col("ts"), p)))
          .as("text_deduped"),
        (size(col("ts")) - size(col("kp"))).cast("long")
          .as("n_tok_removed"))
  }
}
