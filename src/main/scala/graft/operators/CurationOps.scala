package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-corpus curation operators beyond dedup: sequence packing,
  * benchmark decontamination, and corpus clustering — the last-mile
  * steps between a cleaned document set and a training run.
  */
object CurationOps {

  /** Sequence packing: assign documents, in deterministic `doc_id`
    * order, to cumulative token-budget bins — the batch analogue of
    * packing documents into fixed-length training sequences.
    *
    * Packing is inherently sequential (each doc's bin depends on the
    * running token total), so it is SHARDED: docs are split into
    * `shards` deterministic streams (`doc_id mod shards`) and the
    * running sum is a window PARTITIONED by shard — shards is the
    * parallelism knob, sized to the cluster (each shard's window is
    * one task over corpus/shards rows). This is also how training
    * pipelines actually pack: per-worker, not globally — a global
    * running sum would be the single-task window this library bans.
    *
    * Returns per-doc rows: doc_id, shard, n_tokens, cum_tokens, bin
    * (a doc lands in the bin its last token falls into; zero-token
    * docs at the head of a shard have cum_tokens 0, clamped into bin 0
    * — without the clamp, `-1 div budget` is 0 under Spark's
    * truncating `div` but -1 under floor-division engines, an
    * engine-dependent bin id for an empty doc). */
  def packSequences(docs: DataFrame, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        pmod(col("doc_id"), lit(shards)).as("shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        expr(s"greatest(cum_tokens - 1, 0L) div $budget"))
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minOverlap` distinct shingles with the eval/benchmark subset.
    *
    * `shingles` is the exploded distinct (doc_id, shingle) set (e.g.
    * [[DedupOps.docShingles]]); `isEval` marks the benchmark rows.
    * The eval shingle vocabulary is benchmark-sized (tiny next to the
    * corpus), so the overlap probe is one equi-join of the corpus
    * shingles against it (broadcast when small — Catalyst decides from
    * stats) followed by a map-side-combined count per doc. Work scales
    * with true overlaps, never corpus². */
  def contamination(shingles: DataFrame, isEval: Column,
      minOverlap: Int = 3): DataFrame = {
    val evalSh = shingles.filter(isEval).select("shingle").distinct()
    shingles.filter(!isEval)
      .join(evalSh, Seq("shingle"))
      .groupBy("doc_id")
      // rows are distinct (doc_id, shingle): count == distinct overlap
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Two-stage BLOOM-GATED [[contamination]]: the eval vocabulary is
    * summarized as a doc42 bit array (KB-sized, shippable where the
    * eval set itself is not — the cross-cluster / privacy-bounded
    * decontamination pattern), the corpus prefilters against it, and
    * the exact overlap join runs on SUSPECT documents only. Lossless
    * by the no-false-negative guarantee: every truly overlapping
    * shingle is bloom-positive, so bloom-positive count ≥ true
    * overlap count and no contaminated doc can fail the gate —
    * output EQUALS plain [[contamination]] (doc44 pins this against
    * doc13's oracle). Size `m` for the eval vocabulary (a saturated
    * filter stays lossless but stops pruning). */
  def contaminationBloomGated(shingles: DataFrame, isEval: Column,
      minOverlap: Int = 3, d: Int = 3, m: Int = 4096): DataFrame = {
    val evalSh = shingles.filter(isEval).select("shingle").distinct()
    val train = shingles.filter(!isEval)
    val bits = SketchOps.bloomBits(evalSh, "shingle", d, m)
    val positive = SketchOps
      .bloomMightContain(bits, train.select("shingle"), "shingle", d, m)
      .filter(col("might_contain"))
      .select(col("item").as("shingle"))
    val suspects = train.join(positive, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_pos"))
      .filter(col("n_pos") >= minOverlap)
      .select("doc_id")
    contamination(
      shingles.join(suspects, Seq("doc_id"), "left_semi")
        .unionByName(shingles.filter(isEval)),
      isEval, minOverlap)
  }

  /** Deterministic mixture sampling: per-stratum inclusion rates (out
    * of 256) keyed on a content-independent hash of the id — the
    * training-mixture knob ("keep 25% of en, all of de, ...") with the
    * property RAND() lacks: stable under reprocessing and
    * repartitioning, so a resumed or re-run pipeline selects the SAME
    * documents. Pure codegen filter, no shuffle; strata missing from
    * `rates256` default to rate 0 (excluded). */
  def mixtureSample(docs: DataFrame, strataCol: String,
      rates256: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(
      md5(col(idCol).cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long")
    val rate = rates256.foldLeft(lit(0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .withColumn("rate256", rate)
      .filter(col("bucket") < col("rate256"))
  }

  /** K-means assignment step over an embedding corpus (cosine): each
    * vector's nearest centroid, via the shared
    * [[SimilarityOps.rankedCellAssignments]] broadcast-scan. The
    * building block for semantic clustering in data curation
    * (cluster-balanced sampling, per-cluster quality review).
    * Returns (vec_id, cid, ccos). */
  def assignClusters(embs: DataFrame, dim: Int = 64,
      nCentroids: Int = 8): DataFrame =
    SimilarityOps.rankedCellAssignments(embs, dim, nCentroids)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("ccos"))

  /** Per-document n-gram repetition ratio — the repetitiveness signal
    * quality filters cut on (boilerplate, keyword stuffing, generation
    * loops score high; prose scores low): the most frequent bigram's
    * share of all bigram OCCURRENCES. Shape: explode + two map-side-
    * combined aggregates keyed by doc — work ∝ corpus tokens, state ∝
    * per-task distinct (doc, bigram) pairs, no doc-level skew (a doc's
    * bigrams co-locate only at the final doc-keyed aggregate, which
    * carries one row per distinct bigram, already combined). Docs with
    * fewer than two tokens have no bigrams and drop out. */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        explode(TextFunctions.bigramsAllFromTokens(col("ts"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("max_count"))
      .withColumn("rep_ratio",
        col("max_count").cast("double") / col("n_bigrams").cast("double"))

  /** Span-level duplicate detection (the exact-substring-dedup signal
    * of Lee et al.'s "Deduplicating Training Data" — approximated at
    * `w`-word granularity): per document, how many of its distinct
    * `w`-word spans also occur in at least one OTHER document. Whole-
    * doc fingerprints miss a duplicated passage pasted into otherwise-
    * distinct documents; this localizes it and yields the
    * cut-or-keep ratio quality filters act on.
    *
    * Shape: span explosion (corpus-token-proportional, no shuffle) →
    * one map-side-combined df count keyed by span → an equi-join of
    * the spans against their df (span-keyed shuffle join at scale;
    * never all-pairs) → one doc-keyed aggregate. The same class as
    * the decontamination probe, with the corpus itself as the index.
    *
    * `dfCap` < Long.MaxValue enables the stop-span guard (the doc10
    * stop-shingle move applied here): a span present in more than
    * `dfCap` documents — a boilerplate header, a license block — is
    * already PROVEN duplicated, so its occurrences never need the
    * span-keyed join at all. Those spans are split off via a
    * broadcast anti-join (the hot list is vocab-tail-sized) and their
    * docs credited directly with one map-side-combined count; the
    * expensive join runs only over spans with bounded df, which caps
    * the worst join-key skew at `dfCap` rows per key. Results are
    * IDENTICAL to the uncapped path — df > dfCap ≥ 1 implies df ≥ 2,
    * so every capped occurrence is a dup span by definition. */
  def dupSpanStats(docs: DataFrame, w: Int = 8,
      dfCap: Long = Long.MaxValue): DataFrame = {
    val spans = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        explode(TextFunctions.wordGramsFromTokens(col("ts"), w))
          .as("span"))
    // rows are distinct (doc_id, span) by construction, so the span
    // count IS its distinct-document frequency
    val df = spans.groupBy("span").agg(count(lit(1)).as("span_df"))
    val ratio = (n: Column, d: Column) =>
      d.cast("double") / n.cast("double")
    if (dfCap == Long.MaxValue)
      spans.join(df, Seq("span"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("span_df") >= 2, 1L).otherwise(0L))
            .as("n_dup_spans"))
        .withColumn("dup_ratio",
          ratio(col("n_spans"), col("n_dup_spans")))
    else {
      require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
      val hot = df.filter(col("span_df") > dfCap).select("span")
      // hot occurrences are all dup spans — counted without the join
      val hotPerDoc = spans.join(broadcast(hot), Seq("span"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
      val coldDf = df.filter(col("span_df") <= dfCap)
      val coldPerDoc = spans
        .join(broadcast(hot), Seq("span"), "left_anti")
        .join(coldDf, Seq("span"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_cold"),
          sum(when(col("span_df") >= 2, 1L).otherwise(0L))
            .as("n_dup_cold"))
      coldPerDoc.join(hotPerDoc, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(col("n_cold"), lit(0L)) +
            coalesce(col("n_hot"), lit(0L))).as("n_spans"),
          (coalesce(col("n_dup_cold"), lit(0L)) +
            coalesce(col("n_hot"), lit(0L))).as("n_dup_spans"))
        .withColumn("dup_ratio",
          ratio(col("n_spans"), col("n_dup_spans")))
    }
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — the document-level filter
    * battery most open corpus pipelines reuse): token-count bounds,
    * mean-word-length band, minimum alphabetic-word fraction, minimum
    * stopword hits. Each rule is its own boolean column plus the
    * conjunction, so pipelines can audit WHICH rule kills a document
    * (the operational requirement — a single opaque pass/fail can't be
    * tuned). Pure scan-side codegen over the text column: no shuffle,
    * no UDFs — the shape a 100 TB quality sweep must have, since it
    * runs over every document of the raw corpus. Thresholds are the
    * paper's defaults; all are knobs.
    *
    * Double-valued rules compare exactly across engines: each ratio is
    * one division of two exact integers (single IEEE rounding), so the
    * derived booleans are deterministic too. */
  def gopherQuality(docs: DataFrame,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Long = 2): DataFrame =
    gopherQualityKeeping(docs, minTokens, maxTokens, minWordLen,
      maxWordLen, minAlphaFrac, minStopwords)
      .select(col("doc_id"), col("n_tokens"), col("n_token_chars"),
        col("n_alpha_tokens"), col("n_stopwords"), col("mean_word_len"),
        col("alpha_frac"), col("pass_len"), col("pass_word_len"),
        col("pass_alpha"), col("pass_stop"), col("pass_all"))

  /** [[gopherQuality]] KEEPING every input column alongside the rule
    * columns — the form a pure-projection split ([[
    * graft.streaming.QualityGate]]) needs: scoring stays one
    * codegen'd scan with no join back to the input. */
  def gopherQualityKeeping(docs: DataFrame,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Long = 2): DataFrame =
    docs
      .withColumn("_ts", TextFunctions.tokens(col("text")))
      .withColumn("n_tokens", size(col("_ts")).cast("long"))
      .withColumn("n_token_chars", TextFunctions.tokenChars(col("text")))
      .withColumn("n_alpha_tokens",
        size(filter(col("_ts"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stopwords", TextFunctions.stopwordCount(col("text")))
      .drop("_ts")
      .withColumn("mean_word_len",
        col("n_token_chars").cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("alpha_frac",
        col("n_alpha_tokens").cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("pass_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_word_len",
        col("mean_word_len") >= minWordLen &&
          col("mean_word_len") <= maxWordLen)
      .withColumn("pass_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("pass_stop", col("n_stopwords") >= minStopwords)
      .withColumn("pass_all",
        col("pass_len") && col("pass_word_len") &&
          col("pass_alpha") && col("pass_stop"))

  /** Per-document corpus-frequency (rarity) profile — the
    * distributional quality signal LM-perplexity filters approximate:
    * how much of a document is made of corpus-rare vocabulary
    * (gibberish, OCR noise, codes) vs very common boilerplate. Exact
    * integer statistics only (no libm logs — the doc09 determinism
    * contract): token count, rare-token occurrences (corpus frequency
    * ≤ `rareMax`), and the total corpus-frequency mass, from which
    * `rare_ppm` and `mean_freq_x1000` each derive by a single
    * truncating integer division (scaled so no float ever enters the
    * output).
    *
    * Shape: one (doc, word) pre-aggregate (bounds any per-key row
    * count by the corpus vocabulary, not raw occurrences) → a
    * vocab-sized frequency table → a word-keyed equi-join back → one
    * doc-keyed aggregate. `hotDf` < Long.MaxValue splits the join by
    * frequency — the Zipf head (cf > hotDf: few words, most
    * occurrences) resolves via a broadcast map-side join with NO
    * shuffle skew, while the shuffled tail join has per-key fan-in
    * bounded by `hotDf` — the same skew split as the doc20 stop-span
    * guard, and exactly equivalent to the plain join. `freq_mass`
    * accumulates in DECIMAL(38,0): per-pair products can cross 2^63
    * summed at corpus scale (the q37 overflow class). */
  def rarityProfile(docs: DataFrame, rareMax: Long = 5,
      hotDf: Long = Long.MaxValue): DataFrame = {
    val pairs = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c_doc"))
    val vocab = pairs.groupBy("word").agg(sum(col("c_doc")).as("cf"))
    val joined =
      if (hotDf == Long.MaxValue) pairs.join(vocab, Seq("word"))
      else {
        require(hotDf >= 1, s"hotDf must be >= 1, got $hotDf")
        val hot = vocab.filter(col("cf") > hotDf)
        val cold = vocab.filter(col("cf") <= hotDf)
        pairs.join(broadcast(hot), Seq("word"))
          .unionByName(pairs
            .join(broadcast(hot.select("word")), Seq("word"), "left_anti")
            .join(cold, Seq("word")))
      }
    joined.groupBy("doc_id")
      .agg(sum(col("c_doc")).as("n_tokens"),
        sum(when(col("cf") <= rareMax, col("c_doc")).otherwise(0L))
          .as("n_rare"),
        // cast BEFORE the multiply: a long×long product crosses 2^63
        // for hot words at corpus scale (cf ~ 1e13 × c_doc ~ 1e2+) —
        // ANSI error or silent wrap; the decimal multiply is exact
        sum(col("c_doc")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("cf"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("freq_mass"))
      // The hashed output is FLOAT-FREE (r6 driver gate: rows+schema
      // matched but the hash flipped on the two derived doubles in
      // exactly one environment): both ratios ship as truncating
      // divisions of exact integers — bit-identical on every engine,
      // library version, and partitioning. rare_ppm is the rare-token
      // share in parts-per-million; mean_freq_x1000 the mean corpus
      // frequency scaled by 1000. Numerators scale inside
      // DECIMAL(38,0) so the scaled products stay exact at corpus
      // scale; `div` truncates (== floor: all values nonnegative).
      .withColumn("rare_ppm", expr(
        "CAST(n_rare AS DECIMAL(38,0)) * 1000000 div n_tokens"))
      .withColumn("mean_freq_x1000", expr(
        "freq_mass * 1000 div n_tokens"))
      // The DECIMAL(38,0) lives only in the accumulation above: the
      // SHIPPED freq_mass is BIGINT so every hashed column of this
      // output is int64 — decimal128 wire/canonicalization differences
      // between engines can't flip the hash. ANSI cast errors loudly
      // (rather than wraps) if a corpus ever pushes a per-doc mass
      // past 2^63, at which point widen the output contract
      // deliberately on both engines.
      .withColumn("freq_mass", col("freq_mass").cast("long"))
  }

  /** Per-document n-gram novelty — the data-selection signal that
    * rewards documents contributing content the corpus does not
    * already have (the complement of [[rarityProfile]]'s boilerplate
    * measure): the share of a document's DISTINCT word-bigram
    * shingles occurring in NO other document. All exact integers;
    * the ratio ships as truncating parts-per-million (the doc23
    * float-free doctrine). Shape: distinct (doc, shingle) explosion →
    * shingle-keyed document-frequency aggregate → equi-join back →
    * doc-keyed aggregate — work ∝ corpus shingles, per-key fan-in
    * bounded by the df of a shingle, never all-pairs. Docs with < 2
    * tokens have no shingles and no row. */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val sh = DedupOps.docShingles(docs).distinct()
    val dfreq = sh.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .withColumn("novel", (col("df") === 1L).cast("long"))
      .select("shingle", "novel")
    sh.join(dfreq, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("novel")).as("n_novel"))
      .withColumn("novelty_ppm", expr(
        "CAST(n_novel AS DECIMAL(38,0)) * 1000000 div n_shingles"))
  }

  /** DSIR-style importance weighting (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much
    * its hashed n-gram feature profile resembles a TARGET slice of
    * the corpus, so selection can up-weight target-like data without
    * training a classifier. Features are distinct word-bigram
    * shingles hashed into `buckets` buckets (the paper's hashed
    * n-gram features); each bucket gets an integer affinity ratio
    * `((target_count+1) * 1e6) div (corpus_count + buckets)`
    * (add-one smoothed, truncating — the doc23 float-free doctrine;
    * the paper's log-ratio becomes a ratio sum so the score stays an
    * exact BIGINT), and a document's weight is the sum of its
    * shingles' bucket affinities with a final per-feature
    * normalization. Shape: shingle explosion → bucket map (native
    * seeded hash, no shuffle) → `buckets`-row aggregate broadcast
    * back → per-doc sum — work ∝ corpus shingles, the ratio table is
    * O(buckets), never a pairwise comparison. Top-N resampling is a
    * downstream orderBy(weight_per_feat_ppm desc, doc_id)+limit —
    * TakeOrderedAndProject, no global window. */
  def dsirWeights(docs: DataFrame, targetSource: String,
      buckets: Int = 64): DataFrame = {
    val sh = dsirShingles(docs, buckets)
    val ratios = dsirRatios(
      sh.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("corpus_cnt"),
          sum((col("source") === targetSource).cast("long"))
            .as("target_cnt")), buckets)
    dsirWeightsFromRatios(sh, ratios)
  }

  /** Distinct (doc_id, shingle, bucket) rows — the DSIR feature
    * explosion shared by [[dsirWeights]] and the incrementally
    * maintained variant ([[graft.streaming.IncrementalDsir]]). */
  private[graft] def dsirShingles(docs: DataFrame,
      buckets: Int): DataFrame = {
    require((buckets & (buckets - 1)) == 0, "buckets must be 2^k")
    DedupOps.docShingles(docs).distinct()
      .withColumn("bucket",
        graft.functions.VectorExpressions.seeded_mix_hash(0,
          col("shingle")).bitwiseAND(lit((buckets - 1).toLong)))
  }

  /** The smoothed integer affinity formula over a per-bucket
    * (corpus_cnt, target_cnt) count table — ONE definition shared by
    * the one-shot and incremental paths so their outputs are
    * bit-identical by construction. */
  private[graft] def dsirRatios(counts: DataFrame,
      buckets: Int): DataFrame =
    counts.withColumn("affinity_ppm", expr(
        s"CAST((target_cnt + 1) AS DECIMAL(38,0)) * 1000000 " +
          s"div (corpus_cnt + $buckets)"))
      .select("bucket", "affinity_ppm")

  /** Per-doc weights of `sh` ([[dsirShingles]] rows) against a bucket
    * affinity table. */
  private[graft] def dsirWeightsFromRatios(sh: DataFrame,
      ratios: DataFrame): DataFrame =
    sh.join(broadcast(ratios), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"),
        sum(col("affinity_ppm")).cast("long").as("weight"))
      .withColumn("weight_per_feat_ppm", expr("weight div n_feat"))

  /** Per-document lexical-diversity profile — the vocabulary-richness
    * quality signals (template/boilerplate text scores low on all
    * three): type-token ratio, hapax ratio (share of once-occurring
    * types), and Simpson repeat concentration Σc(c−1)/(N(N−1)) — the
    * probability two sampled tokens are the same type. All three are
    * single integer-ratio divisions (no libm, no order-dependent float
    * sums), so results are bit-identical on every engine and under any
    * partitioning. Shape: token explosion → two map-side-combined
    * aggregates (doc,word) then (doc) — work ∝ corpus tokens. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c") * (col("c") - lit(1))).as("rep_pairs"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("hapax_ratio",
        col("n_hapax").cast("double") / col("n_types").cast("double"))
      .withColumn("simpson",
        when(col("n_tokens") > 1,
          col("rep_pairs").cast("double") /
            (col("n_tokens") * (col("n_tokens") - lit(1))).cast("double"))
          .otherwise(lit(0.0)))

  /** Curation-funnel report: documents surviving each stage of the
    * standard curation pipeline — quality rules ([[gopherQuality]]),
    * exact dedup ([[DedupOps.exactDupGroups]] survivors), benchmark
    * decontamination ([[contamination]] + eval-set exclusion) — as one
    * (stage, n_docs) table. This is the observability artifact every
    * production curation run ships with: yield per stage is how a
    * too-aggressive (or broken) filter is caught before a training
    * run, not after. All four counts are tiny aggregates over the
    * already-scalable stage operators; nothing is collected.
    *
    * Stage names carry an ordinal prefix so a plain ORDER BY stage
    * reads in pipeline order. */
  def curationFunnel(docs: DataFrame, minOverlap: Int = 3,
      evalMod: Long = 97): DataFrame = {
    val quality = gopherQuality(docs)
      .filter(col("pass_all")).select("doc_id")
    val qdocs = docs.join(quality, Seq("doc_id"))
    val survivors = DedupOps.exactDupGroups(qdocs)
      .select(col("survivor_id").as("doc_id"))
    val contaminated = contamination(DedupOps.docShingles(docs),
        isEval = col("doc_id") % evalMod === 0, minOverlap = minOverlap)
      .select("doc_id")
    val fin = survivors.filter(col("doc_id") % evalMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    def cnt(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt(docs, "1_total")
      .unionByName(cnt(qdocs, "2_quality"))
      .unionByName(cnt(survivors, "3_dedup"))
      .unionByName(cnt(fin, "4_decontam"))
  }

  /** Solve per-stratum inclusion rates (out of 256) that turn observed
    * stratum counts into target PROPORTIONS by down-sampling only —
    * the planning half of [[mixtureSample]]. The most under-
    * represented stratum relative to its target (the binding one)
    * keeps rate 256 (never up-sampled — that would need duplication);
    * every other stratum scales down to match. Rates floor, so
    * realized shares undershoot by < 1/256. Strata absent from
    * `targetShare` get no rate (excluded by mixtureSample). */
  def mixtureRates(counts: Map[String, Long],
      targetShare: Map[String, Double]): Map[String, Int] = {
    val t = targetShare.filter { case (s, share) =>
      share > 0 && counts.getOrElse(s, 0L) > 0L }
    require(t.nonEmpty, "no stratum has both a target share and data")
    // largest total corpus size at which every stratum can still fill
    // its share from existing rows
    val total = t.map { case (s, share) => counts(s) / share }.min
    t.map { case (s, share) =>
      val keepFrac = (share * total) / counts(s)
      s -> math.min(256, math.floor(keepFrac * 256).toInt)
    }
  }

  /** Cluster-balanced deterministic sampling: assign each vector to
    * its nearest centroid, then apply per-CLUSTER inclusion rates (out
    * of 256) with the same content-independent id-hash gate as
    * [[mixtureSample]] — the semantic-curation knob ("down-sample the
    * over-represented cluster, keep the rare ones whole") with the
    * same stability contract: a re-run or repartitioned pipeline
    * selects the SAME vectors. Clusters missing from `rates256`
    * default to rate 0 (excluded). Returns the assignment columns
    * (vec_id, cid, ccos) plus the audit columns bucket/rate256. */
  def clusterSample(embs: DataFrame, rates256: Map[Long, Int],
      dim: Int = 64, nCentroids: Int = 8): DataFrame =
    mixtureSample(
      assignClusters(embs, dim, nCentroids)
        .withColumn("_cid_s", col("cid").cast("string")),
      "_cid_s",
      rates256.map { case (cid, r) => cid.toString -> r },
      idCol = "vec_id")
      .drop("_cid_s")

  /** Per-dimension Lloyd-update numerators over an assignment: for
    * each (cid, pos), the exact fixed-point sum `s = Σ floor(v·scale)`
    * of member values and the member count `n`. Fixed-point makes the
    * update EXACT and partition-order-proof (the library's determinism
    * contract — a float mean reduced in shuffle order is not): floor
    * of an IEEE-exact product is the same integer on every engine and
    * under every partitioning, and integer sums are associative.
    *
    * Scale shape: posexplode then groupBy(cid, pos) — map-side
    * combined, so the shuffle carries k·dim·tasks rows regardless of
    * corpus size. `assigned` needs (cid, embedding). */
  def centroidSums(assigned: DataFrame, dim: Int = 64,
      scale: Long = 1000000L): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cid"), col("pos"),
        floor(col("v").cast("double") * scale).cast("long").as("q"))
      .groupBy("cid", "pos")
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))

  /** One full Lloyd update: new centroid per cluster = per-dimension
    * mean of its members, computed on the [[centroidSums]] fixed-point
    * grid (quantization error ≤ 1/scale per component, far below
    * float32 resolution at the default 1e6). Returns
    * (cid, n_members, ce: array&lt;float&gt;) — float to match the
    * corpus width, ready to feed back into
    * [[SimilarityOps.assignToCentroids]]. The collect_list is k rows
    * of dim structs — metadata-sized by construction. */
  def updateCentroids(assigned: DataFrame, dim: Int = 64,
      scale: Long = 1000000L): DataFrame =
    centroidSums(assigned, dim, scale)
      .withColumn("comp",
        (col("s").cast("double") / col("n").cast("double")) / scale)
      .groupBy("cid")
      .agg(max(col("n")).as("n_members"),
        array_sort(collect_list(struct(col("pos"), col("comp"))))
          .as("comps"))
      .select(col("cid"), col("n_members"),
        transform(col("comps"), c => c.getField("comp"))
          .cast("array<float>").as("ce"))

  /** Lloyd's k-means over an embedding corpus: `iters` assignment
    * passes with a centroid update between consecutive passes. Seeds
    * are the first k corpus vectors (deterministic; callers wanting
    * k-means++ pass their own seeds via the centroids overload).
    * Returns (assignments, centroids) where assignments =
    * (vec_id, cid, ccos) of the LAST pass and centroids the set that
    * produced it.
    *
    * Each iteration is one broadcast corpus scan + one k·dim-sized
    * aggregate — no corpus shuffle anywhere, so wall-clock is
    * iters × scan cost at any corpus size. Lineage grows per
    * iteration; for many iterations at cluster scale, checkpoint or
    * materialize `centroids` between calls (they are k rows — free). */
  /** Leakage-safe train/val/test split: split assignment hashes the
    * near-dup CLUSTER id, not the document id, so every member of a
    * near-duplicate cluster lands in the SAME split — the guard
    * against eval contamination that a per-document split (doc08)
    * cannot give (a train/test near-dup pair inflates eval scores
    * exactly like benchmark contamination). `pairs` is any verified
    * near-dup pair list ([[DedupOps.verifiedNearDups]]); unpaired
    * documents keep their own id as the cluster. Thresholds are
    * md5-bucket boundaries out of 256 (doc08's gate, applied to the
    * component id) — deterministic under reprocessing and
    * re-partitioning. Cost on top of the pair list: the
    * connected-components rounds + one broadcast-able label join. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      trainHi: Int = 204, valHi: Int = 230): DataFrame = {
    val comps = DedupOps.connectedComponents(pairs)
    val hx = substring(
      md5(col("component").cast("string").cast("binary")), 1, 2)
    docs.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("bucket", conv(hx, 16, 10).cast("long"))
      .withColumn("split",
        when(col("bucket") < trainHi, "train")
          .when(col("bucket") < valHi, "val")
          .otherwise("test"))
  }

  /** Per-dimension winsorization bounds for an embedding column: the
    * [pLo, pHi] quantiles of every dimension plus how many values
    * each side would clip — the outlier-robust scaling step before
    * quantization ([[graft.operators.SimilarityOps]] int8/PQ tiers
    * assume bounded ranges; one wild dimension otherwise eats the
    * quantization range). Exact interpolated quantiles here (the
    * oracle contract; gated via [[PercentileOps.Exact]] — each
    * dimension's group holds corpus/dim values, the bounded-input
    * justification). At 100 TB swap in [[PercentileOps.Approx]]: the
    * clip counts stay exact, the bounds carry the sketch's rank
    * error. Shape: one posexplode → dim-keyed percentile aggregate
    * (dim rows, broadcast back) → one counting aggregate. */
  def dimWinsorize(embs: DataFrame, pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    val vals = embs
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val pLoName = s"p${(pLo * 100).round}"
    val pHiName = s"p${(pHi * 100).round}"
    val bounds = PercentileOps.groupPercentiles(vals, "dim", "v",
        Seq(pLo, pHi), PercentileOps.Exact, allowExact = true)
      .select(col("dim"), col(pLoName).as("lo"), col(pHiName).as("hi"))
    vals.join(broadcast(bounds), Seq("dim"))
      .groupBy("dim")
      .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum((col("v") < col("lo")).cast("long")).as("n_lo"),
        sum((col("v") > col("hi")).cast("long")).as("n_hi"),
        count(lit(1)).as("n"))
  }

  /** The 100 TB path of [[dimWinsorize]], oracle-pinned: per-dimension
    * winsorization bounds from the GK quantile SKETCH
    * ([[PercentileOps.Approx]] — bounded memory, partial-aggregated,
    * no per-group full-value buffer anywhere in the plan), audited by
    * RANK band instead of exact value: the sketch's [pLo, pHi] bounds
    * must clip a share of each dimension's values within
    * `bandPct` points of the nominal tail mass (count(v < lo)·100 ∈
    * [n·(pLo·100 − band), n·(pLo·100 + band)], integer arithmetic, and
    * symmetrically above hi). This is the q35/q57 sketch-banding
    * pattern: the oracle pins the band as TRUE per dimension — a
    * sketch whose rank error drifted past the band (or a silent swap
    * to a value-buffering aggregate) fails the driver gate, so the
    * scale path is contractual, not asserted. GK rank error is
    * n/accuracy (0.01 % at the default), orders of magnitude inside
    * the ±3-point band. */
  def dimWinsorizeSketch(embs: DataFrame, pLo: Double = 0.05,
      pHi: Double = 0.95, accuracy: Int = 10000,
      bandPct: Int = 3): DataFrame = {
    val loPct = (pLo * 100).round
    val hiTailPct = ((1.0 - pHi) * 100).round
    require(loPct > bandPct && hiTailPct > bandPct,
      "band must leave a positive lower rank bound")
    val vals = embs
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val pLoName = s"p${loPct}"
    val pHiName = s"p${(pHi * 100).round}"
    val bounds = PercentileOps.groupPercentiles(vals, "dim", "v",
        Seq(pLo, pHi), PercentileOps.Approx(accuracy))
      .select(col("dim"), col(pLoName).as("lo"), col(pHiName).as("hi"))
    def inBand(cnt: Column, target: Long): Column =
      cnt * 100L >= col("n") * (target - bandPct) &&
        cnt * 100L <= col("n") * (target + bandPct)
    vals.join(broadcast(bounds), Seq("dim"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum((col("v") < col("lo")).cast("long")).as("n_lo"),
        sum((col("v") > col("hi")).cast("long")).as("n_hi"))
      .select(col("dim"), col("n"),
        inBand(col("n_lo"), loPct).as("lo_in_band"),
        inBand(col("n_hi"), hiTailPct).as("hi_in_band"))
  }

  /** Curriculum ordering: a distributed-safe TRAINING ORDER for the
    * corpus — cleanest quality band first, deterministic hash shuffle
    * within each band. The order ships as a single BIGINT `sort_key`
    * (stage << 40 | 40-bit md5 shuffle of doc_id), so the training
    * reader materializes the curriculum with one range SORT on
    * (sort_key, doc_id) — a distributed TakeOrdered/range-exchange,
    * never the global-rank window this library bans (a dense global
    * position would funnel the corpus through one task). Stable under
    * reprocessing and re-partitioning (content-independent id hash,
    * the doc08 property). `thresholds` are the ascending quality-band
    * boundaries; band b = #thresholds-below-score, stage = highest
    * band first. */
  def curriculumOrder(docs: DataFrame,
      thresholds: Seq[Double] = Seq(0.3, 0.6, 0.8)): DataFrame = {
    require(thresholds == thresholds.sorted, "thresholds must ascend")
    val q = TextFunctions.qualityScore(col("text"))
    val band = thresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + (q >= t).cast("long")
    }
    val hx = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 10)
    docs
      .withColumn("band", band)
      .withColumn("stage", lit(thresholds.size.toLong) - col("band"))
      .withColumn("shuffle40", conv(hx, 16, 10).cast("long"))
      .withColumn("sort_key",
        col("stage") * lit(1L << 40) + col("shuffle40"))
      .select(col("doc_id"), col("band"), col("stage"),
        col("sort_key"))
  }

  /** Farthest-first (maximin) seeding — the deterministic k-means++
    * variant: seed 0 is the lowest vec_id; each later seed is the
    * corpus vector LEAST similar to the chosen set (minimal maximum
    * cosine, ties to the lowest vec_id). Spreads seeds across the
    * data's extremes, which is what k-means++ buys over first-k
    * seeding, without RNG plumbing (the 2-approximation guarantee of
    * farthest-first traversal is the classical Gonzalez 1985 result).
    *
    * Cost model at scale: k-1 rounds, each ONE broadcast corpus scan
    * (the ≤k-row chosen set broadcasts; the per-vector max-similarity
    * window partitions by vec_id) and one TakeOrderedAndProject argmin
    * — the only driver materialization is a single row per round
    * (control-plane bounded by k, like IncrementalJoin's bucket ids).
    * Returns (seed_rank, vec_id, sim_max) with sim_max NULL for seed 0
    * — sim_max is the chosen vector's max cosine to the seeds before
    * it, the "coverage radius" curve a k-selection sweep reads. */
  def farthestFirstSeeds(embs: DataFrame, k: Int = 8,
      dim: Int = 64): DataFrame = {
    require(k >= 1, "need at least one seed")
    require(embs.select("vec_id").distinct().count() >= k,
      s"corpus has fewer than $k distinct vectors")
    val spark = embs.sparkSession
    val first = embs.select(min(col("vec_id"))).head().getLong(0)
    var chosen = Seq((0L, first, Option.empty[Double]))
    for (rank <- 1 until k) {
      val seedsDf = embs
        .filter(col("vec_id").isin(chosen.map(_._2): _*))
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val next = SimilarityOps.assignToCentroids(embs, seedsDf, dim)
        .filter(col("rn") === 1) // rn 1 = the MOST similar seed
        .filter(!col("vec_id").isin(chosen.map(_._2): _*))
        .orderBy(col("ccos").asc, col("vec_id").asc)
        .select(col("vec_id"), col("ccos"))
        .head()
      chosen = chosen :+ ((rank.toLong, next.getLong(0),
        Some(next.getDouble(1))))
    }
    import spark.implicits._
    chosen.map { case (r, v, s) => (r, v, s) }
      .toDF("seed_rank", "vec_id", "sim_max")
  }

  /** Scalable k-means‖ (Bahmani et al., VLDB 2012) seeding — the
    * fixed-round replacement for [[farthestFirstSeeds]] at real nlist:
    * maximin traversal costs k−1 sequential corpus scans (10⁴
    * sequential jobs at the nlist an IVF index wants at 100 TB), while
    * k-means‖ runs a FIXED number of rounds, each ONE broadcast corpus
    * scan, sampling ~`oversample` new candidates per round with
    * probability proportional to each vector's squared cosine distance
    * to the chosen set, then reduces the candidate set to k seeds by
    * coverage weight. Corpus scans = rounds + 1, independent of k —
    * the flat-round-count property SelectionOpsSpec pins.
    *
    * Determinism (no RNG): the sampling gate replays doc08's md5-gate
    * doctrine per (vec_id, round) — u40 = first 40 md5 bits of
    * "vecId:round"; keep iff u40·φ < d²ᵢ·oversample·2⁴⁰, an EXACT
    * integer inequality (d²ᵢ is the squared distance in fixed-point
    * 1e-9 units, φ its corpus sum — BIGINT-exact, so no float-sum
    * association can flip a borderline gate; this is also precisely
    * min(1, oversample·d²/φ) ≥ u since u40 < 2⁴⁰ makes the clamp
    * automatic). In expectation each round keeps `oversample` vectors
    * (Σ gate probability = oversample exactly); candidates already
    * chosen have d²ᵢ = 0 and can never re-sample.
    *
    * The final reduction takes the k candidates covering the most
    * corpus vectors (nearest-candidate counts, ties to lowest vec_id)
    * — the weight step of the paper with a deterministic weight-top-k
    * in place of its RNG-seeded weighted recluster. Driver traffic is
    * control-plane only: one 1-row φ aggregate + one ≈oversample-row
    * candidate-id collect per round (E[new] = oversample; the gate
    * sum bounds the tail), bounded like IncrementalJoin's bucket ids.
    * Returns the k seed rows (vec_id, weight), heaviest first. */
  def kmeansParallelSeeds(embs: DataFrame, k: Int = 8, rounds: Int = 4,
      oversample: Int = 16, dim: Int = 64): DataFrame = {
    require(k >= 1 && rounds >= 1 && oversample >= 1,
      "k, rounds and oversample must be positive")
    require(oversample.toLong * (1L << 40) > 0, "gate scale overflow")
    val first = embs.select(min(col("vec_id"))).head().getLong(0)
    var cands = Seq(first)
    def candDf(ids: Seq[Long]): DataFrame = embs
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    for (r <- 1 to rounds) {
      val scored = SimilarityOps.assignToCentroids(embs, candDf(cands), dim)
        .filter(col("rn") === 1)
        .select(col("vec_id"),
          floor((lit(1.0) - col("ccos")) * (lit(1.0) - col("ccos"))
            * lit(1000000000.0)).as("d2i"))
      val phi = scored.agg(coalesce(sum("d2i"), lit(0L)))
        .head().getLong(0)
      if (phi > 0L) {
        val u40 = conv(substring(md5(concat(col("vec_id").cast("string"),
          lit(":" + r)).cast("binary")), 1, 10), 16, 10).cast("long")
        val kept = scored.withColumn("u40", u40)
          .filter(col("u40").cast("decimal(38,0)") * lit(phi) <
            col("d2i").cast("decimal(38,0)") *
              lit(oversample.toLong * (1L << 40)))
          .select("vec_id").collect().map(_.getLong(0)).toSeq
        cands = cands ++ kept
      }
    }
    require(cands.size >= k,
      s"k-means|| sampled ${cands.size} candidates < k=$k — raise " +
        "rounds or oversample (E[candidates] = rounds*oversample + 1)")
    SimilarityOps.assignToCentroids(embs, candDf(cands), dim)
      .filter(col("rn") === 1)
      .groupBy("cid").agg(count(lit(1)).as("weight"))
      .select(col("cid").as("vec_id"), col("weight"))
      .orderBy(col("weight").desc, col("vec_id")).limit(k)
  }

  def kmeans(embs: DataFrame, dim: Int = 64, k: Int = 8,
      iters: Int = 2, scale: Long = 1000000L)
      : (DataFrame, DataFrame) = {
    require(iters >= 1, "kmeans needs at least one assignment pass")
    var cents = embs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    var assigned = SimilarityOps.assignToCentroids(embs, cents, dim)
      .filter(col("rn") === 1)
    for (_ <- 1 until iters) {
      cents = updateCentroids(assigned, dim, scale)
        .select(col("cid"), col("ce"))
      assigned = SimilarityOps.assignToCentroids(embs, cents, dim)
        .filter(col("rn") === 1)
    }
    (assigned.select(col("vec_id"), col("cid"), col("ccos")), cents)
  }

  /** Lloyd's k-means from an EXPLICIT seed centroid set `(cid, ce)` —
    * the overload [[kmeans]]'s scaladoc promises, and the refine step
    * of the end-to-end IVF index build
    * ([[graft.streaming.IvfBuild]]): seed with [[kmeansParallelSeeds]]
    * (k-means‖) instead of the first-k stand-in, then run `iters`
    * assignment passes. The k-row centroid frame localCheckpoints per
    * iteration — without it each pass nests the previous pass's full
    * corpus plan inside the next (plan depth ∝ iters), which is the
    * NN-descent / deferred-acceptance lineage lesson applied here;
    * checkpointing k·dim floats per pass is metadata-cost. Returns
    * (assignments (vec_id, cid, ccos), centroids (cid, ce)). */
  def kmeansFrom(embs: DataFrame, seeds: DataFrame, dim: Int = 64,
      iters: Int = 2, scale: Long = 1000000L)
      : (DataFrame, DataFrame) = {
    require(iters >= 1, "kmeans needs at least one assignment pass")
    var cents = seeds.select(col("cid"), col("ce")).localCheckpoint()
    var assigned = SimilarityOps.assignToCentroids(embs, cents, dim)
      .filter(col("rn") === 1)
    for (_ <- 1 until iters) {
      cents = updateCentroids(assigned, dim, scale)
        .select(col("cid"), col("ce")).localCheckpoint()
      assigned = SimilarityOps.assignToCentroids(embs, cents, dim)
        .filter(col("rn") === 1)
    }
    (assigned.select(col("vec_id"), col("cid"), col("ccos")), cents)
  }

  /** Label-margin audit — noisy-label detection over a labeled
    * embedding corpus (confident-learning-lite): build one centroid
    * per LABEL on the [[centroidSums]] fixed-point grid, then score
    * every labeled vector by its cosine margin between its OWN
    * label's centroid and the best RIVAL centroid. A negative margin
    * = the vector sits closer to another label's mass than its own —
    * the standard shortlist for relabeling/review before a training
    * run trusts the labels. Margins ship as truncating integer ppm
    * (the float-free reporting doctrine); the centroid float32
    * reconstitution is cross-engine exact (the emb34 argument:
    * BIGINT sums → identical double divides → identical RTNE casts).
    *
    * Shape at scale: one map-side-combined k·dim aggregate builds
    * the label centroids (label-count-sized — broadcast), one corpus
    * scan scores all labels per vector, two per-vector windows pick
    * own/rival. No pairwise work anywhere.
    * Returns (vec_id, label, rival_label, margin_ppm, suspect). */
  def labelMarginAudit(embs: DataFrame, dim: Int = 64,
      scale: Long = 1000000L): DataFrame = {
    val cents = updateCentroids(
      embs.select(col("label").cast("long").as("cid"),
        col("embedding")), dim, scale)
      .select(col("cid"), col("ce"))
    val scored = SimilarityOps.assignToCentroids(embs, cents, dim)
    val lab = embs.select(col("vec_id"),
      col("label").cast("long").as("label"))
    val sc = scored.join(lab, Seq("vec_id"))
    val own = sc.filter(col("cid") === col("label"))
      .select(col("vec_id"), col("label"), col("ccos").as("own_cos"))
    val wRival = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val rival = sc.filter(col("cid") =!= col("label"))
      .withColumn("orn",
        org.apache.spark.sql.functions.row_number().over(wRival))
      .filter(col("orn") === 1)
      .select(col("vec_id"), col("cid").as("rival_label"),
        col("ccos").as("rival_cos"))
    own.join(rival, Seq("vec_id"))
      .withColumn("margin_ppm",
        floor((col("own_cos") - col("rival_cos")) * 1000000)
          .cast("long"))
      .select(col("vec_id"), col("label"), col("rival_label"),
        col("margin_ppm"), (col("margin_ppm") < 0).as("suspect"))
  }

  /** BPE (byte-pair-encoding) merge-table training over the corpus
    * vocabulary — the tokenizer-training step of an LLM data
    * platform, distributed: repeatedly find the most frequent
    * adjacent symbol pair (weighted by word occurrence count) and
    * merge it, recording the merge table a tokenizer replays at
    * encode time. Ref behavior class: stream-cdc has no text
    * surface; this is part of the LLM-pipeline extension the engine
    * adds (SURVEY §2.3).
    *
    * Semantics (classic Sennrich BPE on the word vocabulary): pair
    * counts sum `tf` over every adjacent OCCURRENCE in every word;
    * the winning pair merges greedily left-to-right within each word
    * ("aaa" + merge (a,a) → "aa","a" — a merged symbol cannot
    * re-merge with its right neighbor in the same round). Ties break
    * on (count DESC, left, right) — binary UTF-8 string order on
    * both engines, so training is deterministic with no RNG.
    *
    * Shape at scale: the state is the VOCABULARY (corpus-sublinear —
    * Heaps' law), not the corpus; one pass builds it, and each merge
    * round is (a) one map-side-combined pair-count aggregate over
    * vocab symbol arrays, (b) a 1-row TakeOrdered driver read (the
    * control-plane scalar, like the NN-descent gain), (c) one narrow
    * per-word fold (higher-order `aggregate`, no shuffle) applying
    * the merge. Rounds are inherently sequential (merge i+1's counts
    * depend on merge i) — that is BPE, not an implementation choice;
    * at production merge counts (30-50k) batch variants that apply
    * the top-m non-interacting pairs per round amortize the round
    * count, at identical per-round cost shape. Per-round state
    * localCheckpoints with immediate free of the superseded round.
    * Returns the merge table (merge_rank, lhs, rhs, pair_count),
    * rank-ordered — nMerges rows, metadata-sized. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    require(nMerges >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    var ck = DedupOps.vocab(docs)
      .select(col("tf"), split(col("word"), "").as("syms"))
      .localCheckpoint()
    var state = ck
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      val best = state.filter(size(col("syms")) >= 2)
        .select(col("tf"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          j => struct(element_at(col("syms"), j).as("l"),
            element_at(col("syms"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // no pairs left anywhere
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
        merges += ((round.toLong, l, r, c))
        val next = state
          .select(col("tf"), bpeMergeFold(col("syms"), l, r).as("syms"))
          .localCheckpoint()
        CheckpointBridge.freeLocalCheckpoint(ck)
        ck = next
        state = next
        round += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** One BPE merge applied to a symbol array — the greedy
    * left-to-right fold shared by [[bpeTrain]] (one winning pair per
    * round) and [[bpeEncode]] (the learned table in rank order): a
    * merged symbol never re-merges with its right neighbor within
    * the same pass. Narrow (higher-order `aggregate`) — no shuffle,
    * no UDF. */
  private def bpeMergeFold(syms: Column, l: String, r: String)
      : Column = {
    val (lm, rm, m) = (lit(l), lit(r), lit(l + r))
    val init = struct(
      expr("cast(array() as array<string>)").as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(syms, init,
      (acc, sym) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev.isNull, struct(out.as("out"), sym.as("prev")))
          .when(prev === lm && sym === rm,
            struct(concat(out, array(m)).as("out"),
              lit(null).cast("string").as("prev")))
          .otherwise(struct(concat(out, array(prev)).as("out"),
            sym.as("prev")))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("prev")))))
  }

  /** Tokenize the corpus with a TRAINED BPE merge table
    * ([[bpeTrain]]'s output, or any (merge_rank, lhs, rhs) frame) and
    * report per-document token statistics — the sizing statistic
    * every training-data pipeline needs before packing
    * ([[packSequences]] consumes token counts): how many TOKENS is
    * this corpus under MY tokenizer, not under a whitespace proxy.
    *
    * Scale shape: merges apply to the VOCABULARY (corpus-sublinear),
    * one narrow fold per merge rank — never to the corpus text; the
    * corpus then equi-joins its word occurrences to the encoded
    * vocab (plain keyed shuffle, AQE-replannable) and aggregates per
    * doc. The merge table itself is driver-collected — it is
    * metadata-sized BY DEFINITION (30-50k rows at production vocab),
    * the same class as a broadcast centroid set.
    * Returns (doc_id, n_words, n_tokens). */
  def bpeEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val table = merges.select(col("merge_rank"), col("lhs"),
        col("rhs")).orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    var enc = DedupOps.vocab(docs)
      .select(col("word"), split(col("word"), "").as("syms"))
    table.foreach { case (l, r) =>
      enc = enc.select(col("word"),
        bpeMergeFold(col("syms"), l, r).as("syms"))
    }
    val counts = enc.select(col("word"),
      size(col("syms")).cast("long").as("n_toks"))
    docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
      .filter(length(col("word")) > 0)
      .join(counts, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_tokens"))
  }

  /** Bigram language-model fluency score — the perplexity-filter step
    * of a CCNet-style curation pipeline (train an n-gram LM, keep the
    * documents the model finds predictable), with the LM trained on
    * the corpus itself: boilerplate and templated text scores high,
    * token soup scores low. Ref behavior class:
    * stream-cdc-style pipelines have no LM scoring; this is part of
    * the LLM-pipeline surface the engine adds.
    *
    * The model is the corpus bigram table: P(w2|w1) estimated as
    * c(w1,w2)/c(w1·) and shipped as truncating integer ppm (the doc23
    * float-free doctrine — no libm, no order-dependent float sums, so
    * the score is bit-identical on every engine and partitioning). A
    * document's score is the truncating mean ppm over its bigram
    * OCCURRENCES (repeats weigh — a doc made of one frequent bigram
    * is maximally predictable). Docs under 2 tokens score 0 over 0
    * bigrams.
    *
    * Shape at scale: one token-array projection → bigram explosion
    * (∝ corpus tokens) → two map-side-combined count aggregates
    * (bigram model, then prefix totals via a second aggregate over
    * the MODEL — vocab-sized, never a re-explosion) → one equi-shuffle
    * join of occurrences against the model on (w1, w2) → per-doc
    * aggregate. The model is vocab²-bounded, not broadcast (at
    * 100 TB it is GBs); the join is a plain keyed shuffle AQE can
    * re-plan. No windows, no driver materialization. */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val bg = bigramOccurrences(docs)
    val scored = bg.join(bigramModel(bg), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_ppm")).as("sum_ppm"))
      .withColumn("avg_ppm", expr("sum_ppm div n_bigrams"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_ppm"), lit(0L)).as("avg_ppm"))
  }

  /** Per-occurrence bigram stream of a corpus — (doc_id, w1, w2),
    * repeats kept (shared by [[bigramLmScore]] and
    * [[bigramLmScoreHeldOut]]). */
  private def bigramOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ts")) - 1),
          i => struct(element_at(col("ts"), i).as("w1"),
            element_at(col("ts"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Bigram model over an occurrence stream: P(w2|w1) as truncating
    * integer ppm (vocab²-bounded, equi-joined — never broadcast). */
  private def bigramModel(bg: DataFrame): DataFrame = {
    val cnt2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cnt1 = cnt2.groupBy("w1").agg(sum("c2").as("c1"))
    cnt2.join(cnt1, Seq("w1"))
      .withColumn("p_ppm", expr("(c2 * 1000000) div c1"))
      .select(col("w1"), col("w2"), col("p_ppm"))
  }

  /** HELD-OUT bigram-LM scoring — a step toward the CCNet recipe:
    * the model trains only on the deterministic md5 TRAIN split (the
    * doc31 gate: first-byte bucket < 204 ≈ 80%), and every document
    * scores against that frozen model. Only the ~20% HELD-OUT
    * documents are fully free of self-grading — train-split docs are
    * in the model they score against, and a large dup cluster still
    * has ~80% of its copies certifying it fluent (CCNet proper
    * trains the LM on a separate reference corpus; full
    * self-exclusion would score each doc against the complement of
    * its own bucket, cross-validation style — k model builds instead
    * of one). Out-of-vocabulary bigrams are the signal the
    * held-out split creates: they contribute 0 ppm AND are counted
    * (`n_oov`) — a doc the model has never seen scores low and shows
    * why. Same integer-ppm determinism doctrine; same corpus-linear
    * shape plus one broadcast-able id-gate semi-join. */
  def bigramLmScoreHeldOut(docs: DataFrame): DataFrame = {
    val bg = bigramOccurrences(docs)
    val bucket = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long")
    val trainIds = docs.select(col("doc_id"))
      .filter(bucket < 204)
    val model = bigramModel(bg.join(trainIds, Seq("doc_id")))
    val scored = bg.join(model, Seq("w1", "w2"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("p_ppm"), lit(0L))).as("sum_ppm"),
        sum(col("p_ppm").isNull.cast("long")).as("n_oov"))
      .withColumn("avg_ppm", expr("sum_ppm div n_bigrams"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("avg_ppm"), lit(0L)).as("avg_ppm"))
  }

  /** CROSS-VALIDATED held-out bigram-LM scoring — the full CCNet-style
    * self-exclusion [[bigramLmScoreHeldOut]] stops short of: docs are
    * split into `folds` deterministic md5 folds, and every document
    * scores against the model trained on the COMPLEMENT of its own
    * fold — no document's tokens are ever in the model that scores it
    * (doc38 left ~80% of docs scoring against a model containing
    * themselves), and a dup cluster can no longer certify itself
    * fluent unless it spans folds. K model builds collapse into ONE
    * counting pass by subtraction: complement counts are
    * total − own-fold (c2_t − c2_f per bigram, c1_t − c1_f per
    * prefix), so the cost over [[bigramLmScoreHeldOut]] is one extra
    * fold-keyed aggregate, never k corpus scans. Out-of-vocabulary
    * (complement count 0) contributes 0 ppm and increments `n_oov`,
    * as in doc38. Same integer-ppm determinism doctrine; model joins
    * stay keyed shuffles (fold × vocab² bounded, never broadcast).
    * Returns (doc_id, n_bigrams, n_oov, avg_ppm). */
  def bigramLmScoreCv(docs: DataFrame, folds: Int = 8): DataFrame = {
    require(folds >= 2, "cross-validation needs >= 2 folds")
    // the fold id is derived from the first 2 md5 hex chars — a
    // 256-value domain; more folds than that would silently leave
    // folds empty and skew the held-out counts
    require(folds <= 256,
      "fold id derives from 2 md5 hex chars (256 values); folds must " +
        "be <= 256")
    val foldOf = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("long") % folds
    val bgf = bigramOccurrences(docs).withColumn("_f", foldOf)
    val c2f = bgf.groupBy("_f", "w1", "w2")
      .agg(count(lit(1)).as("c2f"))
    val c2t = c2f.groupBy("w1", "w2").agg(sum("c2f").as("c2t"))
    val c1f = c2f.groupBy("_f", "w1").agg(sum("c2f").as("c1f"))
    val c1t = c2t.groupBy("w1").agg(sum("c2t").as("c1t"))
    // every occurrence's own (fold, bigram) row exists (it counted
    // itself), so all four joins are inner and lossless
    val occ = bgf
      .join(c2t, Seq("w1", "w2"))
      .join(c2f, Seq("_f", "w1", "w2"))
      .join(c1t, Seq("w1"))
      .join(c1f, Seq("_f", "w1"))
      .select(col("doc_id"),
        when(col("c2t") === col("c2f") || col("c1t") === col("c1f"),
          lit(null))
          .otherwise(expr(
            "((c2t - c2f) * 1000000) div (c1t - c1f)")).as("p_ppm"))
    val scored = occ.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("p_ppm"), lit(0L))).as("sum_ppm"),
        sum(col("p_ppm").isNull.cast("long")).as("n_oov"))
      .withColumn("avg_ppm", expr("sum_ppm div n_bigrams"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("avg_ppm"), lit(0L)).as("avg_ppm"))
  }

  /** DETERMINISTIC WEIGHTED PRIORITY SAMPLING — the weighted subset
    * selector of the curation toolkit (priority-sampling family,
    * Duffield–Lund–Thorup class): each document draws the
    * content-independent doc08 hash u40(doc_id) as its uniform and
    * is ranked by the integer priority u40 div w (w = token count +
    * 1), so heavier documents systematically draw smaller priorities
    * and the bottom-k is a weight-tilted sample — deterministic
    * under reprocessing and repartitioning (no RNG, the doc08
    * doctrine), replayable on any engine. Honesty note: the integer
    * div tilts selection monotonically in w but is not the exact
    * A-ES exponential-keys distribution (which needs log); for a
    * curation pipeline the properties that matter are monotone
    * weight preference + determinism + one pass, all of which hold.
    *
    * Shape at scale: one corpus projection, NO shuffle beyond the
    * global bottom-k — Spark plans orderBy().limit(k) as
    * TakeOrderedAndProject (per-partition heap of k, then a k-sized
    * driver merge), the same plan every top-k query in the registry
    * is gated on; k is control-plane sized.
    * Returns (doc_id, w, priority), the k selected docs. */
  def prioritySample(docs: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 1)
    docs.select(col("doc_id"),
        (size(TextFunctions.tokens(col("text"))).cast("long") + 1L)
          .as("w"),
        graft.operators.SketchOps.u40(col("doc_id")).as("u"))
      .select(col("doc_id"), col("w"),
        expr("u div w").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** RARITY-WEIGHTED KEYWORD EXTRACTION — TF·rarity per document,
    * the tagging/routing primitive (what is this document about?):
    * rarity is the integer-exact stand-in for idf — (N·10⁶) div df,
    * the inverse document-frequency RATIO in truncating ppm, no
    * log/libm (the doc23 doctrine; the log only compresses the
    * ranking, it does not change within-doc keyword ORDER for fixed
    * N... it can across very different df — documented trade for
    * bit-identical cross-engine replay). Top-`m` words per doc by
    * (tf·rarity, word) — a per-doc window bounded by the doc's
    * distinct words.
    *
    * Shape at scale: one token explosion → one (doc, word) count +
    * one word→df count (both map-side-combined) → one equi-join on
    * word + the 1-row corpus-count broadcast → per-doc top-m window.
    * The df table is vocab-sized, an equi-shuffle join, never
    * broadcast. Returns (doc_id, word, tf, df, score, rnk). */
  def rarityKeywords(docs: DataFrame, m: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m >= 1)
    val words = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val tf = words.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n1 = docs.agg(count(lit(1)).as("n_docs"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(n1))
      .withColumn("score",
        col("tf") * expr("(n_docs * 1000000L) div df"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= m)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  /** Sliding-window token chunking — the context-window prep step for
    * RAG indexing and fixed-length pretraining examples: each document
    * becomes overlapping chunks of `window` tokens advancing by
    * `stride` (overlap = window − stride carries context across the
    * boundary). Chunk boundaries are pure functions of the token
    * count, so the output is deterministic under reprocessing and
    * re-partitioning; (doc_id, chunk_idx) is the stable chunk key.
    *
    * A doc of L ≤ window tokens is one chunk; otherwise
    * 1 + ⌈(L − window)/stride⌉ chunks, the last one ending exactly at
    * the final token (it may be shorter than `window`, never empty).
    * Empty docs produce one empty chunk — the caller filters if chunks
    * must be non-empty; dropping them here would silently lose the
    * doc-id from downstream per-chunk rollups.
    *
    * Shape at scale: one projection + one explosion, work and output
    * ∝ corpus tokens × (window/stride) amplification; no shuffle at
    * all — chunking stays partition-local and pipelines into whatever
    * consumes the chunks. */
  def slidingChunks(docs: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val nChunks = when(col("n_tok") <= window, lit(1L))
      .otherwise(
        expr(s"1L + (n_tok - $window + $stride - 1) div ${stride}L"))
    docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("ts"))
      .withColumn("n_tok", size(col("ts")).cast("long"))
      .withColumn("n_chunks", nChunks.cast("long"))
      .select(col("doc_id"), col("ts"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride + 1)
      .withColumn("chunk_len",
        least(lit(window.toLong), col("n_tok") - col("start_tok") + 1))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("chunk_len"),
        concat_ws(" ", slice(col("ts"), col("start_tok").cast("int"),
          col("chunk_len").cast("int"))).as("chunk_text"))
  }

  /** Per-dimension embedding-distribution drift audit between a
    * reference corpus slice and a current one — the "did the embedding
    * space move?" gate in front of every consumer that froze
    * centroids, codebooks or winsorization bounds on the reference
    * distribution (emb04/13/14 IVF cells, emb11 PQ, emb22 bounds):
    * at 100 TB those artifacts are retrained on DRIFT EVIDENCE, not on
    * a calendar.
    *
    * Two signals per dimension, both exact-integer so the audit is
    * bit-identical across engines and partitionings (no log/sqrt —
    * deliberately TVD over PSI, whose ln() is libm-dependent):
    *
    *  - `tvd_ppm`: total variation distance between the two 16-bin
    *    histograms over the fixed [-1, 1) value range, computed as
    *    Σ|cur·n_ref − ref·n_cur| · 10⁶ div (2·n_ref·n_cur) — integer
    *    cross-multiplied, truncating ppm;
    *  - `mu_ref_fp`/`mu_cur_fp`: truncating fixed-point (1e-6) means
    *    from per-value floored integers.
    *
    * Shape: one posexplode per side → (dim, bin) counting aggregate
    * (map-side combined; 64·16 result rows per side) → one dim-keyed
    * merge. Metadata-scale output, corpus-linear single pass. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame): DataFrame =
    driftFromHists(embeddingHistogram(ref), embeddingHistogram(cur))

  /** Per-(dim, bin) histogram of an embedding frame — the sufficient
    * statistic [[embeddingDrift]] consumes, exposed so
    * [[graft.streaming.IncrementalDrift]] can maintain it ADDITIVELY
    * under batched ingest (counts and fixed-point sums are pure sums
    * over rows, so per-bin cells add across document-disjoint
    * batches — the IncrementalDsir argument, applied to drift).
    *
    * vf is the OFFSET fixed-point value floor((v+1)·1e6): nonnegative,
    * so the truncating div in [[driftFromHists]] IS floor division in
    * both engines (Spark `div` truncates toward zero, DuckDB `//`
    * floors — they agree only on nonnegative operands; the −1e6
    * shift-back happens after the division, identically on both
    * sides). */
  def embeddingHistogram(embs: DataFrame): DataFrame =
    embs
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .withColumn("bin",
        least(lit(15L), greatest(lit(0L),
          floor((col("v") + 1.0) * 8.0).cast("long"))))
      .withColumn("vf", floor((col("v") + 1.0) * 1000000).cast("long"))
      .groupBy("dim", "bin")
      .agg(count(lit(1)).as("cnt"), sum("vf").as("vsum"))

  /** Drift statistics from two [[embeddingHistogram]] frames — the
    * metadata-scale half of [[embeddingDrift]], shared with the
    * incremental path so maintained == one-shot by construction. */
  def driftFromHists(href: DataFrame, hcur: DataFrame): DataFrame = {
    val merged = href
      .select(col("dim"), col("bin"), col("cnt").as("c_ref"),
        col("vsum").as("s_ref"))
      .join(hcur.select(col("dim"), col("bin"), col("cnt").as("c_cur"),
        col("vsum").as("s_cur")), Seq("dim", "bin"), "full_outer")
      .select(col("dim"), col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"),
        coalesce(col("s_ref"), lit(0L)).as("s_ref"),
        coalesce(col("s_cur"), lit(0L)).as("s_cur"))
    val totals = merged.groupBy("dim")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"),
        sum("s_ref").as("t_ref"), sum("s_cur").as("t_cur"))
    // BIGINT-exact while n_ref·n_cur < ~4.6e12 per dimension (≈ 2M
    // values per side per dim); past that the same formula runs in
    // DECIMAL(38,0) — the counts, not the corpus, are the operands.
    val numer = merged
      .join(broadcast(totals.select("dim", "n_ref", "n_cur")), Seq("dim"))
      .groupBy("dim")
      .agg(sum(abs(col("c_cur") * col("n_ref") -
        col("c_ref") * col("n_cur"))).as("numer"))
    // one-sided dimensions (present in only one histogram, or an
    // empty side) are EXACTLY the ones that drifted most — without
    // the guard the division by n_ref·n_cur = 0 nulls their tvd_ppm
    // (and errors in DuckDB), silently dropping the strongest signal.
    // TVD of a distribution vs nothing is its mass = 1.0 → the
    // 1000000-ppm sentinel; the missing side's mean is undefined →
    // NULL, never a fabricated number.
    totals.join(numer, Seq("dim"))
      .select(col("dim"), col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0 || col("n_cur") === 0, lit(1000000L))
          .otherwise(
            expr("(numer * 1000000) div (2 * n_ref * n_cur)"))
          .as("tvd_ppm"),
        when(col("n_ref") === 0, lit(null).cast("long"))
          .otherwise(expr("t_ref div n_ref") - 1000000L)
          .as("mu_ref_fp"),
        when(col("n_cur") === 0, lit(null).cast("long"))
          .otherwise(expr("t_cur div n_cur") - 1000000L)
          .as("mu_cur_fp"))
  }
}
