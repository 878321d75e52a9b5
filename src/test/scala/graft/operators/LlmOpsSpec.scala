package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.sources.Tables

class LlmOpsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf("sf0.001"), "documents")
  private lazy val embs = Tables.load(spark, sf("sf0.001"), "embeddings")

  test("text functions: counts and quality on a known string") {
    import spark.implicits._
    val df = Seq("the quick fox and the dog ").toDF("text")
    val row = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.stopwordCount($"text").as("s"),
      TextFunctions.qualityScore($"text").as("q")).collect()(0)
    assert(row.getAs[Long]("n") == 6)
    assert(row.getAs[Long]("s") == 3) // the, and, the
    val q = row.getAs[Double]("q")
    assert(q > 0 && q < 1)
  }

  test("PII redaction: typed placeholders, email-first, no-op on clean") {
    import spark.implicits._
    val df = Seq(
      "reach user42@mail.example.com or +1-555-0042 today",
      "no pii here at all",
      "double a1@b.co c2@d.org").toDF("text")
    val got = df.select(
      TextFunctions.redactPii($"text").as("r"),
      TextFunctions.emailCount($"text").as("e"),
      TextFunctions.phoneCount($"text").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ("reach <EMAIL> or <PHONE> today", 1L, 1L))
    assert(got(1) == ("no pii here at all", 0L, 0L))
    // both addresses replaced; the digits inside them never seen by
    // the phone pass (email runs first)
    assert(got(2) == ("double <EMAIL> <EMAIL>", 2L, 0L))
  }

  test("bigram shingles: ordered pairs, distinct, safe under 2 tokens") {
    import spark.implicits._
    val df = Seq("a b c b c", "solo").toDF("text")
    val got = df.select(TextFunctions.bigramShingles($"text").as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b c", "c b"))
    assert(got(1).isEmpty)
  }

  test("exact dedup finds planted duplicates") {
    import spark.implicits._
    val planted = docs.limit(5).union(docs.limit(5))
    val groups = DedupOps.exactDupGroups(planted)
    assert(groups.count() == 5)
    assert(groups.filter($"n_copies" === 2).count() == 5)
  }

  test("minhash LSH: identical docs always collide; signature width") {
    import spark.implicits._
    val twins = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s"),
      (3L, "p q r m n o k j")).toDF("doc_id", "text")
    val sig = DedupOps.minhashSignature(twins)
    assert(sig.columns.toSeq == "doc_id" +: (0 until 8).map(i => s"h$i"))
    val pairs = DedupOps.verifiedNearDups(twins).collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getAs[Long]("doc_a") == 1L && p.getAs[Long]("doc_b") == 2L)
    assert(p.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: 16-bit strings, identical text -> identical hash") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val sh = DedupOps.simhash(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(sh(1L).length == 16 && sh(1L).forall(c => c == '0' || c == '1'))
    assert(sh(1L) == sh(2L))
  }

  test("brute-force topk: self excluded, neighbors ranked, k respected") {
    val topk = SimilarityOps.bruteForceTopK(embs, nQueries = 3, k = 5)
      .collect()
    assert(topk.length == 15)
    val byQuery = topk.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      // descending cosine
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
      assert(!rows.exists(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
    }
  }

  test("LSH ANN: all candidates share the query's bucket") {
    val res = SimilarityOps.lshTopK(embs, nQueries = 2, k = 3).collect()
    assert(res.nonEmpty)
    val buckets = SimilarityOps.lshBucket(col("embedding"), 64, 6)
    val byId = embs.select(col("vec_id"), buckets.as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    res.foreach { r =>
      assert(byId(r.getAs[Long]("neighbor_id")) ==
        byId(r.getAs[Long]("query_id")))
    }
  }

  test("multi-probe IVF recall dominates single-probe at every rank") {
    def byQueryRank(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("rnk")) -> r.getAs[Double]("cos")).toMap
    val single = byQueryRank(SimilarityOps.ivfTopK(embs))
    val probed = byQueryRank(SimilarityOps.ivfTopKProbed(embs, nProbe = 2))
    assert(probed.nonEmpty)
    // widening the candidate pool can only improve (or tie) the
    // cosine at each rank — the defining property of multi-probe
    single.foreach { case (key, cosSingle) =>
      probed.get(key).foreach(cosProbed =>
        assert(cosProbed >= cosSingle - 1e-12,
          s"$key: probed $cosProbed < single $cosSingle"))
    }
    // and at least one query actually benefits on this corpus
    assert(probed.exists { case (key, c) =>
      single.get(key).exists(c > _ + 1e-12)
    }, "nProbe=2 changed nothing — corpus/centroids degenerate?")
  }

  test("rolling hash expression matches the Scala reference") {
    import spark.implicits._
    import graft.functions.VectorExpressions
    val sample = docs.limit(20)
    val got = sample.select($"doc_id", $"text",
      VectorExpressions.text_rolling_hash($"text").as("h")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("h") ==
        VectorExpressions.rollingHashRef(r.getAs[String]("text")))
    }
    // equal texts -> equal hash; distinct fingerprints for our sample
    assert(got.map(_.getAs[Long]("h")).distinct.length == got.length)
  }

  test("seeded mix hash: matches reference, seeds decorrelate, mixes high bits") {
    import spark.implicits._
    import graft.functions.VectorExpressions
    def ref(seed: Int, s: String): Long =
      VectorExpressions.SeededMixHash.fmix64 {
        var h = 0L
        (seed + "|" + s).getBytes("UTF-8").foreach(b => h = h * 31L + (b & 0xff))
        h
      }
    val sample = docs.limit(20)
    val got = sample.select($"text",
      VectorExpressions.seeded_mix_hash(0, $"text").as("h0"),
      VectorExpressions.seeded_mix_hash(1, $"text").as("h1")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("h0") == ref(0, r.getAs[String]("text")))
      assert(r.getAs[Long]("h1") == ref(1, r.getAs[String]("text")))
    }
    // fmix64 avalanche: short strings must still span negative longs
    // (raw poly-31 of short ASCII never would — that's the MinHash bug
    // this finalizer exists to prevent)
    val short = Seq("a b", "b c", "c d", "d e", "e f").toDF("t")
      .select(VectorExpressions.seeded_mix_hash(0, $"t").as("h"))
      .as[Long].collect()
    assert(short.exists(_ < 0L) && short.distinct.length == short.length)
  }

  test("minhash FastMix and Md5Vocab find the same verified near-dup pairs") {
    val fast = DedupOps.verifiedNearDups(docs,
      scheme = DedupOps.HashScheme.FastMix)
      .select("doc_a", "doc_b", "n_inter", "jaccard").collect().toSet
    val md5 = DedupOps.verifiedNearDups(docs,
      scheme = DedupOps.HashScheme.Md5Vocab)
      .select("doc_a", "doc_b", "n_inter", "jaccard").collect().toSet
    assert(fast.nonEmpty && fast == md5)
  }

  test("MinHashAggregator: one-pass signature equals k min-aggregates") {
    import spark.implicits._
    val sample = docs.limit(50)
    val viaAggregator = DedupOps.docShingles(sample)
      .groupBy($"doc_id")
      .agg(graft.functions.MinHashAggregator.minhash(8)($"shingle")
        .as("sig"))
    val viaMinColumns =
      DedupOps.minhashSignature(sample, 8, DedupOps.HashScheme.Md5Vocab)
    val joined = viaAggregator.join(viaMinColumns, "doc_id").collect()
    assert(joined.length == 50)
    joined.foreach { r =>
      val sig = r.getAs[collection.Seq[String]]("sig")
      (0 until 8).foreach(i => assert(sig(i) == r.getAs[String](s"h$i")))
    }
  }

  test("multimodal: binary schema, batch decode matches stub") {
    val media = MultimodalOps.toMediaColumns(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = MultimodalOps.extractFeatures(spark, media)
    val one = feats.filter(col("doc_id") === 0L).collect()(0)
    val text = docs.filter(col("doc_id") === 0L)
      .select("text").collect()(0).getString(0)
    val (first, w, h, sum) = MultimodalOps.decodeStub(text.getBytes("UTF-8"))
    assert(one.first_byte == first && one.width == w &&
      one.height == h && one.checksum == sum)
    assert(one.n_bytes == text.getBytes("UTF-8").length)
  }

  test("repeatedSpans: cross-doc spans at every occurrence; " +
      "intra-doc-only repeats excluded") {
    import spark.implicits._
    // docs 1 and 2 share the 4-token span "a b c d" (doc 2 twice);
    // doc 3 repeats "p q r s" twice WITHIN itself only — not
    // cross-doc, so it must not be reported
    val d = Seq(
      (1L, "a b c d x y z w"),
      (2L, "u a b c d v a b c d"),
      (3L, "p q r s p q r s")).toDF("doc_id", "text")
    val got = DedupOps.repeatedSpans(d, spanLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4))).toSet
    // occurrences of "a b c d": doc1 pos1, doc2 pos2 and pos7
    assert(got == Set((1L, 1L, 2L, 3L), (2L, 2L, 2L, 3L),
      (2L, 7L, 2L, 3L)))
  }

  test("spanCoverage: overlapping spans merge into islands; " +
      "uncovered docs report 0") {
    import spark.implicits._
    // doc1 and doc2 are near-identical 10-token docs: doc1 positions
    // 1..6 all start repeated 4-spans (one island covering 1..9 =
    // 9 tokens); doc3 shares nothing
    val d = Seq(
      (1L, "a b c d e f g h i x"),
      (2L, "a b c d e f g h i y"),
      (3L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val got = DedupOps.spanCoverage(d, spanLen = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // spans 1..6 of doc1 repeat in doc2 -> one island [1, 10) = 9
    // covered tokens of 10 -> 900000 ppm
    assert(got(1L) == ((6L, 1L, 9L, 10L, 900000L)))
    assert(got(2L) == ((6L, 1L, 9L, 10L, 900000L)))
    assert(got(3L) == ((0L, 0L, 0L, 10L, 0L)))
  }

  test("spanCoverage: disjoint islands count separately") {
    import spark.implicits._
    // the shared spans sit at both ENDS of a 14-token doc with a
    // 2-token unique gap in the middle -> two islands of 6 tokens
    val d = Seq(
      (1L, "a b c d e f g1 h1 p q r s t u"),
      (2L, "a b c d e f g2 h2 p q r s t u")).toDF("doc_id", "text")
    val got = DedupOps.spanCoverage(d, spanLen = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // spans at pos 1,2,3 (island [1,7) = 6) and pos 9,10,11
    // (island [9,15) = 6): 12 of 14 tokens -> 857142 ppm
    assert(got(1L) == ((6L, 2L, 12L, 14L, 857142L)))
    assert(got(2L) == ((6L, 2L, 12L, 14L, 857142L)))
  }

  test("removeRepeatedSpans: cuts the islands complement, keeps " +
      "clean docs verbatim") {
    import spark.implicits._
    // doc1/doc2: ends shared (islands [1,7) and [9,15)), the 2-token
    // unique middle survives; doc3 shares nothing and passes through
    val d = Seq(
      (1L, "a b c d e f g1 h1 p q r s t u"),
      (2L, "a b c d e f g2 h2 p q r s t u"),
      (3L, "m n o p2 q2 r2 s2 t2 u2 v2")).toDF("doc_id", "text")
    val got = DedupOps.removeRepeatedSpans(d, spanLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("g1 h1", 12L)))
    assert(got(2L) == (("g2 h2", 12L)))
    assert(got(3L) == (("m n o p2 q2 r2 s2 t2 u2 v2", 0L)))
    // conservation: removed tokens == spanCoverage's covered tokens
    val cov = DedupOps.spanCoverage(d, spanLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    got.foreach { case (id, (_, rm)) => assert(rm == cov(id)) }
  }

  test("removeRepeatedSpans: a fully-covered doc empties") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")).toDF("doc_id", "text")
    val got = DedupOps.removeRepeatedSpans(d, spanLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("", 6L)) && got(2L) == (("", 6L)))
  }

  test("shingle caches drain: no residual cached blocks after release") {
    import spark.implicits._
    DedupOps.unpersistShingleCaches(blocking = true) // start clean
    // skyline shells registered by earlier suites in the shared
    // session follow the same drain lifecycle
    graft.operators.SkylineOps.unpersistShellCaches(blocking = true)
    val twins = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s"),
      (3L, "p q r m n o k j")).toDF("doc_id", "text")
    (1 to 3).foreach { _ =>
      DedupOps.verifiedNearDups(twins).count()
      val released = DedupOps.unpersistShingleCaches(blocking = true)
      assert(released >= 1, "persist was not registered for release")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"residual cached RDDs: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("PQ rerank with a full-width pool equals brute-force top-k") {
    // when the ADC pool spans the whole corpus, re-ranking IS the
    // exact search — pins that the rerank tier loses nothing beyond
    // pool membership
    val exact = SimilarityOps.bruteForceTopK(embs, nQueries = 12, k = 5)
      .filter(col("query_id") >= 8)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val rr = SimilarityOps.pqTopKReranked(embs,
      candidates = 1000000, topK = 5)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rr == exact)
  }

  test("IVF-PQ: trained residual codebook lowers MSE; search is total") {
    val residuals = SimilarityOps.ivfResiduals(embs)
    val residEmbs = SimilarityOps.ivfResidualsAsEmbeddings(residuals, 8)
    val firstK = SimilarityOps.ivfResidualCodebook(residuals, 8, 64, 8, 4)
    val trained = SimilarityOps.pqTrainCodebook(residEmbs, k = 4,
      iters = 2)
    val mse0 = SimilarityOps.pqQuantizationMse(residEmbs, firstK)
    val mse1 = SimilarityOps.pqQuantizationMse(residEmbs, trained)
    assert(mse1 < mse0,
      s"residual training did not reduce MSE: $mse0 -> $mse1")
    // both search paths return exactly topK rows per query, ranked
    for (df <- Seq(SimilarityOps.ivfPqTopK(embs),
        SimilarityOps.ivfPqTopKTrained(embs))) {
      val rows = df.collect()
      val byQ = rows.groupBy(_.getLong(0))
      assert(byQ.keySet == Set(12L, 13L, 14L, 15L))
      byQ.values.foreach { rs =>
        assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 5L))
      }
      // a query never returns itself
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    }
  }

  test("PQ Lloyd training lowers quantization error; encode stays total") {
    val firstK = SimilarityOps.pqFirstKCodebook(embs, 64, 8, 4)
    val trained = SimilarityOps.pqTrainCodebook(embs, k = 4, iters = 2)
    val mse0 = SimilarityOps.pqQuantizationMse(embs, firstK)
    val mse1 = SimilarityOps.pqQuantizationMse(embs, trained)
    assert(mse1 < mse0,
      s"training did not reduce quantization MSE: $mse0 -> $mse1")
    // every vector gets exactly one code per subspace
    val n = embs.count()
    val codes = SimilarityOps.pqEncodeWith(embs, trained)
    assert(codes.count() == n * 8)
    assert(codes.groupBy("vec_id", "m").count()
      .filter(col("count") =!= 1).isEmpty)
  }

  test("connected components: chains, separate clusters, min labels") {
    import spark.implicits._
    // cluster {1,2,3} as a CHAIN (diameter 2, forces propagation),
    // cluster {10,11}, and a self-contained pair {20,21}
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // a long chain still converges (diameter = n-1 propagation rounds)
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = DedupOps.connectedComponents(chain)
      .select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(1L))
  }

  test("containmentPairs: planted snippet found asymmetrically") {
    import spark.implicits._
    // doc 1 = a 5-token snippet (3 trigram shingles at the default
    // w=3), doc 2 = a long doc embedding it verbatim, doc 3 =
    // unrelated. Jaccard(1,2) is far below near-dup thresholds;
    // containment(1→2) = 1.0. With 3 docs every shingle is rare.
    val snippet = "alpha beta gamma delta epsilon"
    val long = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 " + snippet +
      " y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    val docs = Seq((1L, snippet), (2L, long), (3L, "p q r s t u v"))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(docs, minContain = 0.8,
      minShingles = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    DedupOps.unpersistShingleCaches(blocking = true)
    // only 1→2 passes: all 4 snippet shingles appear in doc 2
    assert(got.toSeq == Seq((1L, 2L, 1000000L)))
  }

  test("containmentPairs: prefix filter is lossless vs brute force") {
    // real corpus slice; reference computed with NO candidate
    // filtering from the same kept-shingle sets
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val got = DedupOps.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val sh = DedupOps.docWordGrams(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    DedupOps.unpersistShingleCaches(blocking = true)
    val df = sh.groupBy(_._2).map { case (s, rows) => s -> rows.length }
    val kept = sh.filter(p => df(p._2) <= 100)
      .groupBy(_._1).map { case (d, rows) => d -> rows.map(_._2).toSet }
    val brute = (for {
      (a, sa) <- kept.toSeq; if sa.size >= 3
      (b, sb) <- kept.toSeq; if a != b
      inter = (sa & sb).size
      ppm = inter.toLong * 1000000L / sa.size
      if ppm >= 800000L
    } yield (a, b, inter.toLong, sa.size.toLong, ppm)).toSet
    assert(got == brute)
  }

  test("containmentPairs: minShingles gates degenerate tiny sets") {
    import spark.implicits._
    // doc 1 has ONE shingle, fully shared — gated by minShingles 3
    // (shingleW=2 keeps the single-bigram construction meaningful)
    val docs = Seq((1L, "a b"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(docs, minContain = 0.5,
      minShingles = 3, shingleW = 2).collect()
    DedupOps.unpersistShingleCaches(blocking = true)
    assert(!got.exists(_.getLong(0) == 1L))
  }

  test("mediaSimhash/NearDups: identical payloads at Hamming 0; " +
      "banding lossless vs brute force") {
    import spark.implicits._
    val media = MultimodalOps.toMediaColumns(docs)
    // identical payloads -> identical phash: plant a dup of doc 0
    val d0 = docs.filter($"doc_id" === 0).withColumn("doc_id", lit(-1L))
    val withDup = MultimodalOps.toMediaColumns(docs.unionByName(d0))
    val dupPair = MultimodalOps.mediaNearDups(withDup)
      .filter($"doc_a" === -1L && $"doc_b" === 0L).collect()
    assert(dupPair.length == 1 && dupPair(0).getLong(2) == 0L)
    // banded candidates lose nothing under maxHam < bands: compare
    // against all-pairs Hamming on the real sf0.001 corpus
    val ph = MultimodalOps.mediaSimhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    val brute = (for {
      (a, pa) <- ph; (b, pb) <- ph; if a < b
      d = java.lang.Long.bitCount(pa ^ pb); if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = MultimodalOps.mediaNearDups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("frameNearDups: re-cut content matches; df cap kills " +
      "universal frames") {
    import spark.implicits._
    // 16-byte frames. doc 1 = frames A B C D; doc 2 = a RE-CUT
    // (D C A B reordered + one new frame) — shares 4 frames; doc 3
    // unrelated. With minMatch 3, only (1,2) matches.
    def f(c: Char) = c.toString * 16
    val docs = Seq(
      (1L, f('a') + f('b') + f('c') + f('d')),
      (2L, f('d') + f('c') + f('a') + f('b') + f('z')),
      (3L, f('p') + f('q') + f('r') + f('s'))
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = MultimodalOps.frameNearDups(
        MultimodalOps.toMediaColumns(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 4L)))
    // a universal frame shared by everyone is capped out: with
    // maxDf = 2, a frame in all 3 docs cannot form candidates
    val univ = Seq(
      (1L, f('u') + f('a') + f('b') + f('c')),
      (2L, f('u') + f('a') + f('b') + f('x')),
      (3L, f('u') + f('y') + f('w') + f('v'))
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val capped = MultimodalOps.frameNearDups(
        MultimodalOps.toMediaColumns(univ), minMatch = 3, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,2) share u+a+b = 3 frames, but u is df-capped -> only 2 left
    assert(capped.isEmpty)
    val uncapped = MultimodalOps.frameNearDups(
        MultimodalOps.toMediaColumns(univ), minMatch = 3, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(uncapped.toSeq == Seq((1L, 2L, 3L)))
  }

  test("knnGraph: full-probe graph equals brute-force all-pairs top-k") {
    // probing EVERY cell removes the approximation — the graph must
    // then be exactly the n² top-k (the recall trade is the only
    // difference between the cell-bounded and brute paths)
    val k = 3
    val full = SimilarityOps.knnGraph(embs, nCentroids = 8,
        nProbe = 8, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val vecs = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = vecs.flatMap { case (id, v) =>
      vecs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k)
        .zipWithIndex
        .map { case ((nid, _), i) => (id, nid, (i + 1).toLong) }
    }.toSet
    assert(full.nonEmpty && full == brute)
    // partial probing returns a total graph too (k rows per vector)
    val approx = SimilarityOps.knnGraph(embs, nProbe = 2, k = k)
    assert(approx.count() == vecs.length.toLong * k)
  }

  test("nnDescentStep: monotone per-vector improvement, recall rises") {
    // seed = the content-blind ring graph (a cell-local seed is
    // structurally a no-op: its hop-2 expansion never leaves the
    // already-searched cell — the ringSeedGraph scaladoc note, which
    // this test originally discovered)
    val k = 4
    val seedRing = SimilarityOps.ringSeedGraph(embs, k = k)
    val base = embs.select(col("vec_id"), col("embedding"))
    val seed = SimilarityOps.nnDescentStep(embs, seedRing, k = k)
      .select(col("vec_id"), col("nbr_id"), col("cos"), col("rnk"))
    val refined = SimilarityOps.nnDescentStep(embs, seed, k = k)
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos")))
    val s = edges(seed); val r = edges(refined)
    assert(r.length == s.length) // stays a total k-graph
    // per-vector cosine at every rank can only improve (candidate
    // superset + same ranking)
    val sBy = s.groupBy(_._1); val rBy = r.groupBy(_._1)
    sBy.foreach { case (v, se) =>
      val sc = se.map(_._3).sorted.reverse
      val rc = rBy(v).map(_._3).sorted.reverse
      sc.zip(rc).foreach { case (a, b) =>
        assert(b >= a - 1e-12, s"vec $v got worse")
      }
    }
    // and the step actually helps somewhere on this corpus: edge sets
    // differ and total cosine mass strictly increases
    assert(r.map(_._3).sum > s.map(_._3).sum + 1e-9)
  }

  test("nnDescent: loop == unrolled steps; recall monotone to target") {
    val k = 4
    // (1) the fixed-round service (early stop disabled) is exactly
    // the manual unrolling — pins the loop composition the emb31
    // oracle replays in SQL
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
      .toSet
    val two = SimilarityOps.nnDescent(embs, k = k, maxRounds = 2,
      minGainPpm = -1L)
    val manual = SimilarityOps.nnDescentStep(embs,
      SimilarityOps.nnDescentStep(embs,
        SimilarityOps.ringSeedGraph(embs, k = k), k = k), k = k)
    assert(edgeSet(two) == edgeSet(manual))

    // (2) ground truth: brute-force top-k sets per vector
    val vecs = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth: Map[Long, Set[Long]] = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k).map(_._1).toSet
    }.toMap
    def recall(edges: Set[(Long, Long)]): Double = {
      val hit = edges.count { case (v, n) => truth(v)(n) }
      hit.toDouble / (truth.size * k)
    }

    // (3) recall@k is monotone nondecreasing per round (each new
    // top-k is picked from a candidate SUPERSET of the kept edges,
    // so a true neighbor once held is only ever displaced by a
    // higher-cosine edge — itself a true neighbor, ties aside).
    // localCheckpoint per round: each step references its input
    // graph ~4× (undirected view joined with itself), so an
    // uncheckpointed 6-round chain is a 4⁶-reference plan
    var g = SimilarityOps.nnDescentStep(embs,
      SimilarityOps.ringSeedGraph(embs, k = k), k = k).localCheckpoint()
    var rs = List(recall(edgeSet(g)))
    for (_ <- 2 to 6) {
      g = SimilarityOps.nnDescentStep(embs, g, k = k).localCheckpoint()
      rs = recall(edgeSet(g)) :: rs
    }
    val perRound = rs.reverse
    perRound.sliding(2).foreach {
      case List(a, b) => assert(b >= a - 1e-9,
        s"recall fell between rounds: $perRound")
      case _ =>
    }
    assert(perRound.last > perRound.head)

    // (4) convergence to target recall needs a corpus NN-descent is
    // FOR: the synthetic table is near-isotropic in 64-d (median
    // pairwise cos ≈ 0, hop-2 self-recovery ≈ 10% — measured), the
    // algorithm's documented worst case, where descent is monotone
    // (above) but slow — a simulation replaying the exact step rule
    // reproduces the Spark per-round recalls to 3 decimals, so the
    // slowness is the data, not the operator. Real embedding corpora
    // have low INTRINSIC dimensionality (that is why NN-descent works
    // in practice — Dong et al. §5); derive one deterministically:
    // keep each vector's first 3 coords as the latent position and
    // spread them over 64 dims by a fixed cosine mixing matrix.
    // There, with k=8 (≳ the connectivity threshold; Dong uses K≥20
    // on real data), descent reaches ≥95% of the exact graph from
    // the content-blind seed within 12 rounds.
    val k8 = 8
    val lowDim = embs.selectExpr("vec_id",
      ("transform(sequence(1, 64), d -> cast(" +
        "cos(d * 1.0d) * embedding[0] + cos(d * 2.0d) * embedding[1]" +
        " + cos(d * 3.0d) * embedding[2] as float)) as embedding"))
    val lvecs = lowDim.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val ltruth: Map[Long, Set[Long]] = lvecs.map { case (id, v) =>
      id -> lvecs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k8).map(_._1).toSet
    }.toMap
    val conv = SimilarityOps.nnDescent(lowDim, k = k8,
      maxRounds = 12, minGainPpm = 1000L)
    val convEdges = edgeSet(conv)
    val lrec = convEdges.count { case (v, n) => ltruth(v)(n) }
      .toDouble / (ltruth.size * k8)
    assert(lrec >= 0.95, s"converged recall on structured corpus: $lrec")
  }

  test("bpeTrain: greedy non-overlap, merged symbols chain, ties") {
    import spark.implicits._
    // "aaaa" ×3: round 1 pair (a,a) counts 3 occurrences/word ×3
    // words = 9; greedy left-to-right merge gives "aa","aa" (the
    // middle overlap is NOT merged), so round 2's best pair is
    // (aa,aa) — the merged symbol participates in later rounds
    val aaaa = Seq.fill(3)("aaaa").toDF("text")
    val m1 = CurationOps.bpeTrain(aaaa, nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m1.toSeq == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
    // odd length: "aaa" under (a,a) → "aa","a"; round 2 merges
    // (aa,a), count = word count
    val aaa = Seq.fill(2)("aaa").toDF("text")
    val m2 = CurationOps.bpeTrain(aaa, nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m2.toSeq == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
    // tie-break: "ab" and "cd" tie at count 1 each; (a,b) < (c,d)
    // in binary order wins round 1
    val tie = Seq("ab cd").toDF("text")
    val m3 = CurationOps.bpeTrain(tie, nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m3.toSeq == Seq(("a", "b"), ("c", "d")))
    // exhaustion: fewer pairs than requested merges stops early
    val tiny = Seq("xy").toDF("text")
    assert(CurationOps.bpeTrain(tiny, nMerges = 5).count() == 1)
    // weighting is by OCCURRENCE (tf), not distinct word: "zz" seen
    // 5 times beats "qr" seen once
    val wt = Seq("zz zz zz zz zz qr").toDF("text")
    val m4 = CurationOps.bpeTrain(wt, nMerges = 1).collect()
    assert((m4(0).getString(1), m4(0).getString(2),
      m4(0).getLong(3)) == ("z", "z", 5L))
  }

  test("labelMarginAudit flags the planted flip; knnClassify " +
      "recovers held-back labels") {
    import spark.implicits._
    // two tight clusters in 64-d; vector 17 carries the WRONG label
    def vec(base: Int, i: Int) = Array.tabulate(64)(d =>
      (if (d == base) 10f else 0f) + ((i * 7 + d) % 5) * 0.01f)
    val rows = (0L until 40L).map { i =>
      val cluster = (i % 2).toInt
      val label = if (i == 17L) 1 - cluster else cluster
      (i, vec(cluster, i.toInt), label)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val audit = CurationOps.labelMarginAudit(embs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(audit(17L), "planted flip not flagged")
    assert(audit.count(_._2) <= 3,
      s"suspect list too long: ${audit.filter(_._2).keys.toSeq.sorted}")
    // propagate labels to the held-back 20%: every one recovers its
    // cluster despite the one polluted vote vector 17 contributes
    val pred = SimilarityOps.knnClassify(embs, $"vec_id" % 5 =!= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pred.size == 8)
    pred.foreach { case (v, p) => assert(p == v % 2, s"vec $v") }
    // the capacity skew guard at a non-binding cap changes nothing
    // (20 per cluster ≤ cap → strict assignment = nearest assignment)
    val predCap = SimilarityOps.knnClassify(embs,
        $"vec_id" % 5 =!= 0, capacity = Some(20L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(predCap == pred)
  }

  test("deletionVariants: exact variant set, count bound holds") {
    import spark.implicits._
    val v = Seq("abc").toDF("word")
    val got2 = DedupOps.deletionVariants(v, maxEdit = 2).collect()
      .map(_.getString(1)).toSet
    // 0 deletions {abc}; 1 {bc, ac, ab}; 2 {c, b, a}
    assert(got2 == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val got1 = DedupOps.deletionVariants(v, maxEdit = 1).collect()
      .map(_.getString(1)).toSet
    assert(got1 == Set("abc", "bc", "ac", "ab"))
    // per-word bound 1 + L + L(L-1)/2 on a real vocabulary
    val vocab = DedupOps.vocab(docs)
    val counts = DedupOps.deletionVariants(vocab.select("word"))
      .groupBy("word").count()
      .join(vocab.select(col("word"), length(col("word")).as("L")),
        Seq("word"))
      .collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val l = r.getInt(2).toLong
      assert(r.getLong(1) <= 1L + l + l * (l - 1) / 2)
    }
  }

  test("fuzzyVocabPairs: symmetric-delete blocking is lossless") {
    // brute-force all-pairs Levenshtein over the real sf0.001
    // vocabulary vs the SymSpell equi-join path — same pair set with
    // the same distances proves no candidate is lost to blocking.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = DedupOps.vocab(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = vocab.keys.toSeq.sorted
    val brute = (for {
      a <- words; b <- words; if a < b
      d = lev(a, b); if d <= 2
    } yield (a, b, d.toLong, vocab(a), vocab(b))).toSet
    val got = DedupOps.fuzzyVocabPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // corpus really exercises the operator
  }
}
