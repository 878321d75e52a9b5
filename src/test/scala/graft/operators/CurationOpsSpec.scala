package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Curation operators: packing bin boundaries, planted contamination,
  * cluster self-assignment. */
class CurationOpsSpec extends SparkSpec {

  test("packSequences: bins follow the cumulative budget per shard") {
    import spark.implicits._
    // shard = doc_id % 2; budget 10. shard 0: token counts 4, 5, 3 →
    // cums 4, 9, 12 → bins 0, 0, 1. shard 1: a 12-token doc overflows
    // the budget alone — it lands in the bin of its LAST token (1).
    val docs = Seq(
      (0L, "a b c d"),
      (2L, "a b c d e"),
      (4L, "a b c"),
      (1L, "t t t t t t t t t t t t")).toDF("doc_id", "text")
    val got = CurationOps.packSequences(docs, budget = 10, shards = 2)
      .select("doc_id", "shard", "cum_tokens", "bin").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == (0L, 4L, 0L))
    assert(got(2L) == (0L, 9L, 0L))
    assert(got(4L) == (0L, 12L, 1L))
    assert(got(1L) == (1L, 12L, 1L))
  }

  test("packSequences: head-of-shard bin is clamped non-negative") {
    import spark.implicits._
    // The whitespace tokenizer never yields 0 tokens (split of "" is
    // [""], both engines), but packSequences must stay well-defined
    // for ANY pluggable token counter: cum_tokens 0 at a shard head
    // would make `-1 div budget` engine-dependent (0 truncating, -1
    // flooring). The clamp pins bin ≥ 0; this test pins both the
    // tokenizer's ≥1 floor and the clamp's no-op on normal data.
    val docs = Seq(
      (0L, "   "),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = CurationOps.packSequences(docs, budget = 10, shards = 1)
      .select("doc_id", "n_tokens", "bin").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (1L, 0L)) // whitespace-only doc: one empty token
    assert(got(2L) == (3L, 0L))
    // the clamp itself, on the op's exact bin expression: cum_tokens 0
    // (a zero-token head doc under some other tokenizer) → bin 0
    val bin = spark.sql(
      "SELECT greatest(CAST(0 AS BIGINT) - 1, 0L) div 10 AS bin")
      .collect()(0).getLong(0)
    assert(bin == 0L)
  }

  test("contamination flags exactly the planted overlaps") {
    import spark.implicits._
    // eval doc 0 = "a b c d e"; doc 1 shares 3 bigrams (a b, b c, c d)
    // → flagged at minOverlap 3; doc 2 shares only "a b" → clean
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d x"),
      (2L, "a b z w q")).toDF("doc_id", "text")
    val got = CurationOps.contamination(
      DedupOps.docShingles(docs), col("doc_id") === 0L, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L)))
  }

  test("bloom-gated contamination == plain contamination (lossless gate)") {
    import spark.implicits._
    // eval doc 0; doc 1 truly contaminated (3 shared bigrams); docs
    // 2-40 share NOTHING with the eval vocabulary (per-doc minted
    // tokens) — exactly what the bloom gate exists to skip
    val docs = (Seq(
      (0L, "a b c d e"),
      (1L, "a b c d x")) ++
      (2L to 40L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d")))
      .toDF("doc_id", "text")
    val sh = DedupOps.docShingles(docs)
    val plain = CurationOps.contamination(sh,
      col("doc_id") === 0L, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gated = CurationOps.contaminationBloomGated(sh,
      col("doc_id") === 0L, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated == plain)
    assert(plain == Set((1L, 3L)))
  }

  test("mixtureSample: deterministic, rate-bounded, unknown strata out") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      (i, if (i % 2 == 0) "en" else "xx")
    }.toDF("doc_id", "lang")
    val rates = Map("en" -> 64) // 25% of the hash space
    val s1 = CurationOps.mixtureSample(docs, "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // unknown stratum fully excluded; selection stable across runs
    assert(s1.forall(_ % 2 == 0))
    val s2 = CurationOps.mixtureSample(docs.repartition(7), "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // ~25% of the 100 en docs (hash-uniform, loose bounds)
    assert(s1.size > 10 && s1.size < 45, s"selected ${s1.size}")
  }

  test("repetitionStats: planted loop scores high, prose low") {
    import spark.implicits._
    val docs = Seq(
      (0L, "buy now buy now buy now buy now"),  // 7 bigrams, "buy now"×4
      (1L, "the quick brown fox jumps over it"), // all distinct
      (2L, "one")).toDF("doc_id", "text")       // <2 tokens: no row
    val got = CurationOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == (7L, 4L, 4.0 / 7.0))
    assert(got(1L)._2 == 1L && got(1L)._3 == 1.0 / 6.0)
  }

  test("dupSpanStats: planted shared passage is localized; w respected") {
    import spark.implicits._
    // docs 0 and 1 share an 8-word passage inside otherwise-distinct
    // text; doc 2 is clean; doc 3 is too short for any 8-gram
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (0L, s"a0 b0 $passage c0 d0"),
      (1L, s"a1 $passage b1 c1 d1 e1"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
      (3L, "s1 s2 s3")).toDF("doc_id", "text")
    val got = CurationOps.dupSpanStats(docs, w = 8).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 0: 12 words → 5 spans, exactly one (the passage) duplicated
    assert(got(0L) == (5L, 1L, 0.2))
    // doc 1: 13 words → 6 spans, one duplicated
    assert(got(1L) == (6L, 1L, 1.0 / 6.0))
    // doc 2: 10 words → 3 spans, none duplicated
    assert(got(2L) == (3L, 0L, 0.0))
    // doc 3: shorter than w → no spans, no row
    assert(!got.contains(3L))
  }

  test("dupSpanStats: stop-span cap path is exactly equivalent") {
    import spark.implicits._
    // the shared passage appears in FIVE docs → its spans have df 5;
    // dfCap 2 routes them through the hot (anti-join) path, dfCap 4
    // too; a doc made ONLY of the passage exercises the
    // all-spans-hot full-outer edge (absent from the cold side)
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (0L, s"a0 b0 $passage c0 d0"),
      (1L, s"a1 $passage b1 c1 d1 e1"),
      (2L, s"q1 q2 $passage"),
      (3L, s"r1 $passage r2"),
      (4L, passage),                              // every span hot
      (5L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),     // clean
      (6L, "s1 s2 s3")).toDF("doc_id", "text")    // too short
    def rows(cap: Long) =
      CurationOps.dupSpanStats(docs, w = 8, dfCap = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val uncapped = rows(Long.MaxValue)
    assert(rows(2L) == uncapped)
    assert(rows(4L) == uncapped)
    assert(rows(1L) == uncapped)
    // doc 4 (single span, duplicated) present with ratio 1.0
    assert(uncapped.contains((4L, 1L, 1L, 1.0)))
  }

  test("gopherQuality: each rule fires independently; flags audit") {
    import spark.implicits._
    val longDoc = (("the of " * 25) + ("alpha beta " * 20)).trim // 90 toks
    val docs = Seq(
      (0L, longDoc),                       // passes everything
      (1L, "short the of doc"),            // fails pass_len only
      (2L, ("x " * 60).trim),              // mean_word_len 1 < 3; no stopwords
      (3L, (("12345 " * 60) + "the of").trim)) // alpha_frac < 0.8
      .toDF("doc_id", "text")
    val got = CurationOps.gopherQuality(docs, minTokens = 50)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("pass_len"), r.getAs[Boolean]("pass_word_len"),
          r.getAs[Boolean]("pass_alpha"), r.getAs[Boolean]("pass_stop"),
          r.getAs[Boolean]("pass_all"))).toMap
    assert(got(0L) == (true, true, true, true, true))
    assert(got(1L)._1 == false && got(1L)._5 == false)
    assert(got(2L)._2 == false && got(2L)._4 == false)
    assert(got(3L)._3 == false && got(3L)._5 == false)
  }

  test("rarityProfile: exact stats; head/tail split join equivalent") {
    import spark.implicits._
    // corpus frequencies: common×6 (3 docs), mid×3, rare×1 each
    val docs = Seq(
      (0L, "common common mid rare1"),
      (1L, "common common mid rare2"),
      (2L, "common common mid rare3")).toDF("doc_id", "text")
    def rows(hotDf: Long) =
      CurationOps.rarityProfile(docs, rareMax = 3, hotDf = hotDf)
        .select("doc_id", "n_tokens", "n_rare", "rare_ppm",
          "mean_freq_x1000")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val plain = rows(Long.MaxValue)
    // cf: common 6, mid 3, rare* 1 → n_rare counts mid + rare rows;
    // mass = 2·6 + 3 + 1 = 16 per doc → 2/4 rare = 500000 ppm,
    // mean 16/4 = 4 → 4000 per-mille
    assert(plain.contains((0L, 4L, 2L, 500000L, 4000L)))
    assert(rows(5L) == plain)   // common is hot, mid+rare cold
    assert(rows(2L) == plain)   // common+mid hot, rare cold
    assert(rows(1L) == plain)   // everything above 1 hot
  }

  test("lexicalDiversity: exact ratios on a constructed vocabulary") {
    import spark.implicits._
    // 6 tokens, 3 types (a×3, b×2, c×1): ttr 0.5, hapax 1/3,
    // simpson = (3·2 + 2·1 + 0) / (6·5) = 8/30
    val docs = Seq(
      (0L, "a a a b b c"),
      (1L, "w x y z")).toDF("doc_id", "text") // all hapax: simpson 0
    val got = CurationOps.lexicalDiversity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Double]("ttr"),
          r.getAs[Double]("hapax_ratio"), r.getAs[Double]("simpson")))
      .toMap
    assert(got(0L) == (6L, 3L, 1L, 0.5, 1.0 / 3.0, 8.0 / 30.0))
    assert(got(1L) == (4L, 4L, 4L, 1.0, 1.0, 0.0))
  }

  test("mixtureRates solves down-sampling rates for target shares") {
    // en is 10x over-represented for a 50/50 target: de (binding)
    // keeps everything, en scales to ~match de's kept volume
    val rates = CurationOps.mixtureRates(
      Map("en" -> 1000L, "de" -> 100L),
      Map("en" -> 0.5, "de" -> 0.5))
    assert(rates("de") == 256)
    assert(rates("en") == 25) // floor(0.1 * 256)
    // realized shares: en ~ 1000*25/256 = 97.6 vs de 100 — equal
    // within the documented < 1/256 floor undershoot
    val en = 1000.0 * rates("en") / 256
    assert(math.abs(en - 100.0) / 100.0 < 0.05)
    // strata without data or without a target are dropped
    val r2 = CurationOps.mixtureRates(
      Map("en" -> 10L, "fr" -> 0L),
      Map("en" -> 1.0, "fr" -> 0.5, "zh" -> 0.2))
    assert(r2 == Map("en" -> 256))
    intercept[IllegalArgumentException] {
      CurationOps.mixtureRates(Map("en" -> 10L), Map("zh" -> 1.0))
    }
  }

  test("clusterSample: per-cluster gates, missing clusters excluded") {
    import spark.implicits._
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    // cluster 0 kept whole, cluster 1 excluded, 2-7 unlisted (rate 0)
    val got = CurationOps.clusterSample(embs, Map(0L -> 256, 1L -> 0))
    val byCid = got.groupBy($"cid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCid.keySet == Set(0L), s"unexpected clusters: $byCid")
    // rate 256 = the whole cluster
    val full = CurationOps.assignClusters(embs)
      .filter($"cid" === 0L).count()
    assert(byCid(0L) == full)
    // stable under repartitioning (the mixtureSample contract)
    val again = CurationOps.clusterSample(embs.repartition(7),
      Map(0L -> 256, 1L -> 0))
    assert(again.select("vec_id").collect().map(_.getLong(0)).toSet ==
      got.select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("kmeans: planted clusters converge; update is deterministic") {
    import spark.implicits._
    // two planted directions (x-axis and y-axis mass) in dim 4; seeds
    // are vecs 0 and 1, with seed 1 sitting between the masses. All
    // component values are binary-exact so the fixed-point grid is too.
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.5f, 0.5f, 0f, 0f)),
      (2L, Array(0.5f, 0f, 0f, 0f)),
      (3L, Array(0.75f, 0.25f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0.25f, 0.75f, 0f, 0f))).toDF("vec_id", "embedding")
    val (assigned, cents) = CurationOps.kmeans(embs, dim = 4, k = 2,
      iters = 2)
    val memb = assigned.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    assert(memb == Map(0L -> 0L, 2L -> 0L, 3L -> 0L,
      1L -> 1L, 4L -> 1L, 5L -> 1L))
    // the updated centroid of the y-mass cluster tilted toward y
    val ce1 = cents.filter($"cid" === 1L)
      .select("ce").collect()(0).getSeq[Float](0)
    assert(ce1(1) > ce1(0), s"centroid 1 did not move to the mass: $ce1")
    // n_members from updateCentroids matches the assignment
    val nm = CurationOps.updateCentroids(
      graft.operators.SimilarityOps.assignToCentroids(embs,
        embs.filter($"vec_id" < 2)
          .select($"vec_id".as("cid"), $"embedding".as("ce")), 4)
        .filter($"rn" === 1), dim = 4)
      .collect().map(r => r.getAs[Long]("cid") ->
        r.getAs[Long]("n_members")).toMap
    assert(nm == Map(0L -> 3L, 1L -> 3L))
    // determinism contract: any input partitioning, bit-identical output
    val (a2, c2) = CurationOps.kmeans(embs.repartition(5), dim = 4,
      k = 2, iters = 2)
    assert(a2.collect().toSet == assigned.collect().toSet)
    assert(c2.collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toList)).toSet ==
      cents.collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toList)).toSet)
  }

  test("assignClusters: centroid vectors assign to themselves at cos 1") {
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    val selfAssign = CurationOps.assignClusters(embs)
      .filter(col("vec_id") < 8).collect()
    assert(selfAssign.length == 8)
    selfAssign.foreach { r =>
      assert(r.getAs[Long]("vec_id") == r.getAs[Long]("cid"))
      assert(math.abs(r.getAs[Double]("ccos") - 1.0) < 1e-9)
    }
  }

  test("bigramLmScore: hand-computed ppm on a 3-doc corpus") {
    import spark.implicits._
    // corpus bigrams: doc0 "a b","b c"; doc1 "a b","b d"; doc2 "x".
    // c2: (a,b)=2 (b,c)=1 (b,d)=1; c1: a·=2, b·=2.
    // ppm: (a,b)=1000000, (b,c)=500000, (b,d)=500000.
    // doc0 avg = (1000000+500000) div 2 = 750000; doc1 same.
    // doc2: 1 token → 0 bigrams, score 0.
    val docs = Seq((0L, "a b c"), (1L, "a b d"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = CurationOps.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (2L, 750000L))
    assert(got(1L) == (2L, 750000L))
    assert(got(2L) == (0L, 0L))
  }

  test("bigramLmScore: repeated bigram weighs per occurrence") {
    import spark.implicits._
    // doc0 = "a a a": bigrams (a,a)x2; corpus c2(a,a)=2, c1(a)=2 →
    // ppm 1000000, avg 1000000 — repetition reads as max fluency,
    // which is exactly why this score is a FILTER input, not a
    // quality score on its own.
    val docs = Seq((0L, "a a a")).toDF("doc_id", "text")
    val r = CurationOps.bigramLmScore(docs).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1000000L)
  }

  test("slidingChunks: boundaries, overlap, last-chunk shortfall") {
    import spark.implicits._
    // 9 tokens, window 4, stride 3:
    // n = 1 + ceil((9-4)/3) = 3 → starts 1,4,7; last covers 7..9
    // (3 tokens — shorter than the window, never empty).
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val got = CurationOps.slidingChunks(docs, window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 4L, 7L))
    assert(got.map(_.getLong(3)).toSeq == Seq(4L, 4L, 3L))
    assert(got(2).getString(4) == "t7 t8 t9")
    // overlap: chunk 0 ends at t4, chunk 1 starts at t4
    assert(got(0).getString(4).endsWith("t4"))
    assert(got(1).getString(4).startsWith("t4"))
  }

  test("slidingChunks: short doc is one chunk; empty doc survives") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "")).toDF("doc_id", "text")
    val got = CurationOps.slidingChunks(docs, window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getString(4)))
    assert(got.length == 2)
    assert(got.contains((0L, 0L, 2L, "a b")))
    // "" tokenizes to [""] on both engines (the packSequences note) —
    // one 1-token chunk of empty text, so the doc id survives chunking
    assert(got.contains((1L, 0L, 1L, "")))
  }

  test("bigramLmScoreHeldOut: frozen train model, OOV counted") {
    import spark.implicits._
    // split ids 0..29 by the doc31 md5 gate (computed here the same
    // way), then give every TRAIN doc "a b a b" and every EVAL doc
    // "x y x y" — eval bigrams are fully out-of-vocabulary
    val ids = (0L until 30L)
    val buckets = ids.toDF("doc_id")
      .withColumn("b", conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2),
        16, 10).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = ids.filter(buckets(_) < 204)
    val evalIds = ids.filter(buckets(_) >= 204)
    assert(trainIds.nonEmpty && evalIds.nonEmpty)
    val docs = ids.map { i =>
      (i, if (buckets(i) < 204) "a b a c" else "x y x y")
    }.toDF("doc_id", "text")
    val got = CurationOps.bigramLmScoreHeldOut(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // train docs "a b a c": prefix a splits 50/50, prefix b is
    // deterministic -> p(a,b)=500000, p(b,a)=1000000, p(a,c)=500000;
    // truncating mean = 2000000 div 3
    trainIds.foreach { i =>
      assert(got(i) == ((3L, 0L, 2000000L / 3)))
    }
    // eval docs: every bigram OOV -> counted, zero score
    evalIds.foreach(i => assert(got(i) == ((3L, 3L, 0L))))
  }

  test("bigramLmScoreCv: a doc's own tokens are NEVER in its scoring " +
      "model (fold-unique bigrams are OOV); cross-fold mass scores") {
    import spark.implicits._
    val folds = 4
    val ids = (0L until 40L)
    val foldOf = ids.toDF("doc_id")
      .withColumn("f", (conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2),
        16, 10).cast("long") % folds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc says "a b" (cross-fold, scorable from the complement)
    // plus a FOLD-UNIQUE bigram "u<f> v<f>": under doc38-style
    // training ~80% of docs would score their own fold's bigram;
    // under CV it is absent from the complement model -> OOV
    val docs = ids.map(i => (i, s"a b u${foldOf(i)} v${foldOf(i)}"))
      .toDF("doc_id", "text")
    val got = CurationOps.bigramLmScoreCv(docs, folds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // occupied folds only (md5 may leave a fold empty over 40 ids)
    val occupied = ids.groupBy(foldOf).filter(_._2.nonEmpty)
    assert(occupied.size >= 2)
    ids.foreach { i =>
      val (nBg, nOov, _) = got(i)
      assert(nBg == 3L, s"doc $i bigrams")
      // "u<f> v<f>" and "b u<f>" exist only in doc i's own fold ->
      // both OOV; "a b" is certified by the other folds
      assert(nOov == 2L, s"doc $i oov=$nOov — own-fold tokens " +
        "leaked into the scoring model")
    }
  }

  test("prioritySample: equals the driver-side bottom-k; heavier " +
      "docs systematically preferred; deterministic") {
    import spark.implicits._
    // 100 docs: even ids are 40-token docs, odd ids 2-token docs
    val docs = (0L until 100L).map { i =>
      val words = if (i % 2 == 0) 40 else 2
      (i, (1 to words).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = CurationOps.prioritySample(docs, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    // driver-side replay of the exact selection rule
    val us = docs.select($"doc_id",
        graft.operators.SketchOps.u40($"doc_id").as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 100L).map { i =>
      val w = (if (i % 2 == 0) 40L else 2L) + 1L
      (i, w, us(i) / w)
    }.sortBy(t => (t._3, t._1)).take(20)
    assert(got.toSeq == want)
    // weight preference: the 20-sample from a 50/50 corpus should be
    // dominated by the ~20x-heavier docs
    assert(got.count(_._2 == 41L) >= 15,
      s"heavy docs underrepresented: ${got.count(_._2 == 41L)}/20")
    // deterministic under repartitioning
    val again = CurationOps.prioritySample(docs.repartition(7), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("rarityKeywords: doc-unique words outrank corpus-wide ones; " +
      "hand-checked scores") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the zebra the quark"),
      (2L, "the the the lemur"),
      (3L, "the apple apple")).toDF("doc_id", "text")
    val got = CurationOps.rarityKeywords(docs, m = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byDoc = got.groupBy(_._1)
    // doc1: zebra/quark df=1 -> score 1*3000000; the df=3 tf=3 ->
    // 3*1000000 = tie at 3000000; tie-break by word asc:
    // quark < the < zebra -> top2 = quark, the
    assert(byDoc(1L).sortBy(_._6).map(_._2).toSeq == Seq("quark", "the"))
    // doc2: lemur 1*3000000 beats the 3*1000000 on the word tiebreak
    assert(byDoc(2L).sortBy(_._6).map(_._2).toSeq == Seq("lemur", "the"))
    // doc3: apple tf=2 df=1 -> 6000000 strictly first; the tf=1 ->
    // 1000000
    assert(byDoc(3L).sortBy(_._6).map(t => (t._2, t._5)).toSeq ==
      Seq(("apple", 6000000L), ("the", 1000000L)))
  }

  test("embeddingDrift: zero drift vs self; planted shift detected") {
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    // identical distributions: every dim at TVD 0, identical means
    val self = CurationOps.embeddingDrift(embs, embs).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getLong(3) == 0L, s"dim ${r.getLong(0)} tvd != 0")
      assert(r.getLong(4) == r.getLong(5))
    }
    // planted +0.1 shift on every coordinate: mean moves ~100000 fp
    // units on every dim and mass crosses bin edges somewhere
    val shifted = embs.withColumn("embedding",
      expr("transform(embedding, x -> x + CAST(0.1 AS FLOAT))"))
    val drift = CurationOps.embeddingDrift(embs, shifted).collect()
    drift.foreach { r =>
      val shift = r.getLong(5) - r.getLong(4)
      assert(shift > 90000L && shift < 110000L,
        s"dim ${r.getLong(0)} mean shift $shift")
    }
    assert(drift.map(_.getLong(3)).max > 0L, "no TVD signal at all")
  }

  test("driftFromHists: one-sided dim gets the full-drift sentinel") {
    import spark.implicits._
    // dim 0 in both histograms, dim 1 only in cur, dim 2 only in ref
    // — the one-sided dims are the MOST drifted and must not be
    // silently nulled by the n_ref*n_cur division
    val href = Seq((0L, 3L, 10L, 5000000L), (2L, 1L, 4L, 800000L))
      .toDF("dim", "bin", "cnt", "vsum")
    val hcur = Seq((0L, 3L, 10L, 5000000L), (1L, 7L, 6L, 9000000L))
      .toDF("dim", "bin", "cnt", "vsum")
    val got = CurationOps.driftFromHists(href, hcur)
      .orderBy("dim").collect()
    assert(got.length == 3)
    val both = got(0)
    assert(both.getLong(3) == 0L && both.getLong(4) == both.getLong(5))
    val curOnly = got(1)
    assert(curOnly.getLong(1) == 0L && curOnly.getLong(2) == 6L)
    assert(curOnly.getLong(3) == 1000000L, "sentinel TVD expected")
    assert(curOnly.isNullAt(4), "mean of the missing side is NULL")
    assert(curOnly.getLong(5) == 9000000L / 6 - 1000000L)
    val refOnly = got(2)
    assert(refOnly.getLong(3) == 1000000L)
    assert(!refOnly.isNullAt(4) && refOnly.isNullAt(5))
  }
}
