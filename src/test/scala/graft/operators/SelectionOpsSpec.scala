package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 selection/retrieval operators: n-gram novelty, MinHash
  * accuracy audit, prefix re-rank retrieval, threshold calibration,
  * modality-aware batch assembly. */
class SelectionOpsSpec extends SparkSpec {

  test("ngramNovelty: exact counts on a constructed corpus") {
    import spark.implicits._
    // doc 0 shares "a b"/"b c" with doc 1; "c z" is doc 0's alone;
    // doc 2 is fully novel; doc 3 has one token -> no shingles
    val docs = Seq(
      (0L, "a b c z"),
      (1L, "a b c"),
      (2L, "p q r"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = CurationOps.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_ppm"))).toMap
    assert(got(0L) == (3L, 1L, 333333L)) // a b, b c shared; c z novel
    assert(got(1L) == (2L, 0L, 0L))
    assert(got(2L) == (2L, 2L, 1000000L))
    assert(!got.contains(3L))
  }

  test("minhashAccuracy: identical docs estimate exactly; error bounded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical to 1
      (3L, "alpha beta gamma delta epsilon eta"),  // near-dup of 1
      (4L, "one two three four five six")).toDF("doc_id", "text")
    val rows = DedupOps.minhashAccuracy(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("match_k"), r.getAs[Long]("n_inter"),
          r.getAs[Long]("n_union"), r.getAs[Long]("est_ppm"),
          r.getAs[Long]("true_ppm"), r.getAs[Long]("err_ppm"))).toMap
    // identical docs: all 8 components match, J = 1 exactly
    val (mk, ni, nu, est, tru, err) = rows((1L, 2L))
    assert(mk == 8L && est == 1000000L && tru == 1000000L && err == 0L)
    assert(ni == nu)
    // every audited pair: est/true consistent with their integers
    rows.values.foreach { case (m, i, u, e, t, er) =>
      assert(m >= 0 && m <= 8 && i >= 1 && u >= i)
      assert(e == m * 1000000L / 8)
      assert(t == i * 1000000L / u)
      assert(er == math.abs(e - t))
    }
  }

  test("prefixRerankTopK: full-corpus shortlist reproduces brute force") {
    import spark.implicits._
    // deterministic 64-dim vectors with varied direction
    val embs = (0L until 30L).map { id =>
      (id, (1 to 64).map(j =>
        ((id * 31 + j * 7) % 13 - 6).toFloat / 6f).toArray)
    }.toDF("vec_id", "embedding")
    val exact = SimilarityOps.bruteForceTopK(embs, k = 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shortlist >= corpus: stage-1 pruning keeps everything, so the
    // re-rank must equal exact brute force
    val full = SimilarityOps.prefixRerankTopK(embs, shortlist = 30, k = 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact)
    // tight shortlist still returns k rows per query, ranked 1..k
    val tight = SimilarityOps.prefixRerankTopK(embs, shortlist = 8, k = 5)
      .collect()
    assert(tight.length == 8 * 5)
    assert(tight.groupBy(_.getAs[Long]("query_id")).values
      .forall(_.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L)))
  }

  test("thresholdCurve: rung counts equal direct filters; monotone") {
    import spark.implicits._
    // ids 20..39 are near-identical twins of 0..19 (one coordinate
    // nudged), so the ladder's upper rungs are guaranteed non-empty
    def base(id: Long) = (1 to 64).map(j =>
      ((id * 17 + j * 3) % 11 - 5).toFloat / 5f).toArray
    val embs = ((0L until 20L).map(id => (id, base(id))) ++
      (20L until 40L).map { id =>
        val v = base(id - 20); v(0) += 0.01f; (id, v)
      }).toDF("vec_id", "embedding")
    val thresholds = Seq(300, 400, 500)
    val curve = SimilarityOps.thresholdCurve(embs,
        thresholdsPermille = thresholds).collect()
      .map(r => r.getAs[Long]("thr_permille") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dropped_docs")))
      .toMap
    val pairs = SimilarityOps.embeddingNearDups(embs, minCos = 0.3)
    assert(curve.nonEmpty, "twin vectors must produce ladder rungs")
    thresholds.foreach { thr =>
      val direct = pairs.filter(col("cos") >= thr.toDouble / 1000.0)
      val expectPairs = direct.count()
      val expectDropped = direct.select("id_b").distinct().count()
      if (expectPairs == 0) assert(!curve.contains(thr.toLong))
      else assert(curve(thr.toLong) == (expectPairs, expectDropped))
    }
    // monotone: higher rung never has more pairs
    val present = thresholds.map(_.toLong).filter(curve.contains)
    present.sliding(2).foreach {
      case Seq(lo, hi) => assert(curve(lo)._1 >= curve(hi)._1)
      case _ => ()
    }
  }

  test("recallAtK: hits equal the toplist intersection; all queries appear") {
    import spark.implicits._
    val embs = (0L until 30L).map { id =>
      (id, (1 to 64).map(j =>
        ((id * 31 + j * 7) % 13 - 6).toFloat / 6f).toArray)
    }.toDF("vec_id", "embedding")
    def toplist(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = toplist(SimilarityOps.bruteForceTopK(embs, k = 5))
    val ann = toplist(SimilarityOps.lshTopK(embs, k = 5))
    val got = SimilarityOps.recallAtK(embs).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm"))).toMap
    assert(got.keySet == (0L until 8L).toSet) // zero-hit queries kept
    got.foreach { case (q, (hits, ppm)) =>
      assert(hits == exact.count { case (eq, n) =>
        eq == q && ann.contains((q, n)) })
      assert(ppm == hits * 1000000L / 5)
    }
  }

  test("batchAssembly: per-modality budgets, exact boundaries, default") {
    import spark.implicits._
    val chunks = Seq(
      // text budget 100: 60+60 crosses at the second chunk
      ("text", 1L, 0L, 60L), ("text", 1L, 1L, 60L),
      ("text", 2L, 0L, 100L),
      // image budget 300: all three fit in batch 0
      ("image", 3L, 0L, 100L), ("image", 3L, 1L, 100L),
      ("image", 4L, 0L, 100L),
      // unknown modality -> default budget 150
      ("video", 5L, 0L, 100L), ("video", 5L, 1L, 100L))
      .toDF("modality", "doc_id", "chunk_id", "byte_len")
    val got = MultimodalOps.batchAssembly(chunks,
        Map("text" -> 100L, "image" -> 300L), defaultBudget = 150L)
      .collect()
      .map(r => (r.getAs[String]("modality"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_id")) -> r.getAs[Long]("batch_id")).toMap
    assert(got(("text", 1L, 0L)) == 0L)  // cum 60
    assert(got(("text", 1L, 1L)) == 1L)  // cum 120 -> (119)/100 = 1
    assert(got(("text", 2L, 0L)) == 2L)  // cum 220 -> (219)/100 = 2
    assert(got(("image", 3L, 0L)) == 0L)
    assert(got(("image", 3L, 1L)) == 0L)
    assert(got(("image", 4L, 0L)) == 0L) // cum 300 -> (299)/300 = 0
    assert(got(("video", 5L, 0L)) == 0L)
    assert(got(("video", 5L, 1L)) == 1L) // cum 200 -> (199)/150 = 1
  }

  test("binaryHammingRerank: sign packing + full-corpus shortlist") {
    import spark.implicits._
    // base direction v; vec 8 = v (same signs as query 0 -> hamming 0),
    // vec 9 = -v (all 64 signs flip -> hamming 64), vec 10 = v with
    // dim 0 flipped (hamming 1), vec 11 = v with dim 63 flipped
    // (hamming 1 in the HIGH word)
    val v = (0 until 64).map(j =>
      (if ((j * 7 + 3) % 5 < 3) 1f else -1f) * (1f + j / 64f)).toArray
    def flip(i: Int): Array[Float] =
      v.zipWithIndex.map { case (x, j) => if (j == i) -x else x }
    val rows = Seq(
      (0L, v), (8L, v), (9L, v.map(x => -x)),
      (10L, flip(0)), (11L, flip(63))) ++
      (12L until 40L).map(id => (id, (0 until 64).map(j =>
        ((id * 31 + j * 7) % 13 - 6).toFloat / 6f).toArray))
    val embs = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.binaryHammingRerank(embs, nQueries = 1,
        shortlist = 100, k = 100)
      .collect()
      .map(r => r.getAs[Long]("neighbor_id") ->
        r.getAs[Long]("hamming")).toMap
    assert(got(8L) == 0L)
    assert(got(9L) == 64L)
    assert(got(10L) == 1L)
    assert(got(11L) == 1L)
    // with shortlist >= corpus the re-rank must equal brute force
    val bf = SimilarityOps.bruteForceTopK(embs, nQueries = 1, k = 5)
      .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    val rr = SimilarityOps.binaryHammingRerank(embs, nQueries = 1,
        shortlist = 100, k = 5)
      .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    assert(rr.except(bf).isEmpty && bf.except(rr).isEmpty)
  }

  test("leakageSafeSplit: cluster members share a split; singletons keep id") {
    import spark.implicits._
    val docs = (0L until 12L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    // clusters {0,1,2} (chain) and {5,6}; the rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = CurationOps.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[String]("split"),
          r.getAs[Long]("bucket"))).toMap
    assert(got.size == 12) // totality
    // cluster labels are the min member; members share the split
    Seq(0L, 1L, 2L).foreach(v => assert(got(v)._1 == 0L))
    Seq(5L, 6L).foreach(v => assert(got(v)._1 == 5L))
    assert(Seq(0L, 1L, 2L).map(got(_)._2).distinct.size == 1)
    assert(Seq(5L, 6L).map(got(_)._2).distinct.size == 1)
    assert(got(7L)._1 == 7L) // singleton keeps own id
    // buckets respect the split thresholds
    got.values.foreach { case (_, split, bucket) =>
      val expect = if (bucket < 204) "train"
        else if (bucket < 230) "val" else "test"
      assert(split == expect)
    }
  }

  test("dimWinsorize: interpolated bounds and clip counts on 1..10") {
    import spark.implicits._
    // dim 0 holds 1..10, dim 1 holds constant 5
    val embs = (1 to 10).map(i =>
      (i.toLong, Array(i.toFloat, 5f))).toDF("vec_id", "embedding")
    val got = CurationOps.dimWinsorize(embs).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
          r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"),
          r.getAs[Long]("n"))).toMap
    // (n-1)*p: 9*0.05 = 0.45 -> lo = 1 + 0.45; 9*0.95 = 8.55 ->
    // hi = 9 + 0.55. Tolerance compare: the engine's interpolation
    // arithmetic and the decimal literals differ in the last ulp
    // (cross-ENGINE equality is the oracle gate's job, not this
    // test's — here only the statistic and the exact counts matter)
    assert(math.abs(got(0L)._1 - 1.45) < 1e-12 &&
      math.abs(got(0L)._2 - 9.55) < 1e-12 &&
      got(0L)._3 == 1L && got(0L)._4 == 1L && got(0L)._5 == 10L)
    assert(got(1L) == (5.0, 5.0, 0L, 0L, 10L))
  }

  test("farthestFirstSeeds: maximin order on constructed directions") {
    import spark.implicits._
    def unit(axis: Int, sign: Float): Array[Float] = {
      val a = Array.fill(64)(0f); a(axis) = sign; a
    }
    val diag = Array.fill(64)(0f)
    diag(0) = 0.7071f; diag(1) = 0.7071f
    // 0: +x, 1: -x, 2: +y, 3: (x+y)/sqrt2. Maximin from +x:
    // -x (cos -1) first, then +y (max cos 0 beats diag's 0.707)
    val embs = Seq(
      (0L, unit(0, 1f)), (1L, unit(0, -1f)),
      (2L, unit(1, 1f)), (3L, diag)).toDF("vec_id", "embedding")
    val got = CurationOps.farthestFirstSeeds(embs, k = 4)
      .orderBy($"seed_rank").collect()
      .map(r => r.getAs[Long]("seed_rank") -> r.getAs[Long]("vec_id"))
    assert(got.toSeq == Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // rank-0 seed has no predecessor similarity
    val r0 = CurationOps.farthestFirstSeeds(embs, k = 4)
      .filter($"seed_rank" === 0).collect().head
    assert(r0.isNullAt(r0.fieldIndex("sim_max")))
  }

  test("balancedAssign: quota keeps most-similar; spill takes 2nd choice") {
    import spark.implicits._
    // centroids are corpus rows 0 (+x) and 1 (+y); vectors 2..7 all
    // prefer +x with strictly decreasing similarity (rotated toward
    // +y), so capacity 3 keeps {0, 2, 3} and spills {4..7} to cid 1
    def rot(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f)
      val t = i * 0.1f
      a(0) = math.cos(t).toFloat; a(1) = math.sin(t).toFloat; a
    }
    val embs = (Seq((0L, rot(0)), (1L, { val a = Array.fill(64)(0f); a(1) = 1f; a })) ++
      (2L to 7L).map(i => (i, rot(i.toInt - 1)))).toDF("vec_id", "embedding")
    val got = SimilarityOps.balancedAssign(embs, nCentroids = 2,
        capacity = 3L).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cid"), r.getAs[Boolean]("moved"))).toMap
    assert(got(0L) == (0L, false) && got(2L) == (0L, false) &&
      got(3L) == (0L, false))
    Seq(4L, 5L, 6L, 7L).foreach(v => assert(got(v) == (1L, true)))
    assert(got(1L) == (1L, false))
    // totality: every vector assigned exactly once
    assert(got.size == 8)
  }

  test("dimWinsorizeSketch: rank bands hold on 1..100; constant dim flags") {
    import spark.implicits._
    // dim 0 is 1..100 (sketch p05/p95 clip ~5% each side → in band);
    // dim 1 is constant (clip counts 0 → OUT of band, the honest
    // signal that winsorization is meaningless on a degenerate dim)
    val embs = (1 to 100).map(i => (i.toLong, Array(i.toFloat, 7f)))
      .toDF("vec_id", "embedding")
    val got = CurationOps.dimWinsorizeSketch(embs).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("lo_in_band"),
          r.getAs[Boolean]("hi_in_band"))).toMap
    assert(got(0L) == (100L, true, true))
    assert(got(1L) == (100L, false, false))
  }

  test("kmeansParallelSeeds: seeds cover separated clusters") {
    import spark.implicits._
    // 3 tight clusters around axes 0/1/2 (cluster = id % 3, strong
    // axis + small id-dependent jitter): the 3 coverage-heaviest
    // candidates must land one per cluster
    def cv(i: Long): Array[Float] = {
      val a = Array.fill(64)(0f)
      a((i % 3).toInt) = 10f
      a(3 + (i % 5).toInt) = 0.1f * ((i % 7) + 1)
      a
    }
    val embs = (0L until 30L).map(i => (i, cv(i)))
      .toDF("vec_id", "embedding")
    val seeds = CurationOps.kmeansParallelSeeds(embs, k = 3, rounds = 3,
      oversample = 6).collect()
    assert(seeds.length == 3)
    val clusters = seeds.map(_.getAs[Long]("vec_id") % 3).toSet
    assert(clusters.size == 3, s"seeds share a cluster: ${seeds.toSeq}")
    assert(seeds.map(_.getAs[Long]("weight")).forall(_ >= 1L))
  }

  test("kmeansParallelSeeds: corpus-scan jobs flat as k grows") {
    import spark.implicits._
    // the whole point vs farthestFirstSeeds: driver actions (and thus
    // corpus scans) are 1 + 2*rounds regardless of k — maximin would
    // be k-1. 400 distinct pseudo-random directions keep phi > 0 so
    // no round short-circuits and the counts are comparable.
    def v(i: Long): Array[Float] = {
      val a = new Array[Float](64)
      var j = 0
      while (j < 64) {
        a(j) = (((i * 7919L + j * 104729L) % 997L) - 498L) / 100f
        j += 1
      }
      a
    }
    val embs = (0L until 400L).map(i => (i, v(i)))
      .toDF("vec_id", "embedding")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def jobsDuring(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        jobs.set(0)
        body
        Thread.sleep(500) // listener events are async
        jobs.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // only the driver-side sampling loop runs inside the count; the
    // returned (lazy) weight frame is materialized outside it
    var small: org.apache.spark.sql.DataFrame = null
    var large: org.apache.spark.sql.DataFrame = null
    val jSmall = jobsDuring {
      small = CurationOps.kmeansParallelSeeds(embs, k = 4, rounds = 3,
        oversample = 8)
    }
    val jLarge = jobsDuring {
      large = CurationOps.kmeansParallelSeeds(embs, k = 16, rounds = 3,
        oversample = 32)
    }
    assert(jSmall == jLarge,
      s"sampling job count grew with k: $jSmall -> $jLarge")
    assert(small.collect().length == 4)
    assert(large.collect().length == 16)
    // determinism across partitioning (the md5-gate property)
    val re = CurationOps.kmeansParallelSeeds(embs.repartition(7), k = 16,
      rounds = 3, oversample = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re == large.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("balancedAssignStrict: capacity holds where one round overflows") {
    import spark.implicits._
    // adversarial second-choice collision: centroids 0 (+x), 1 (+y),
    // 2 (+z); 6 vectors hug +x (second choice ALWAYS +y), 3 vectors
    // hug +y. capacity 4: cell 0 spills 3 vectors onto cell 1, which
    // is already full — one-round balancedAssign leaves cell 1 at 7,
    // strict deferred acceptance cascades the spill on to cell 2 and
    // every cell ends <= 4
    def axis(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f); a(i) = 1f; a
    }
    def near(main: Int, second: Int, t: Double): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(main) = math.cos(t).toFloat; a(second) = math.sin(t).toFloat; a
    }
    val embs = (Seq((0L, axis(0)), (1L, axis(1)), (2L, axis(2))) ++
      (3L to 8L).map(i => (i, near(0, 1, 0.15 + 0.02 * (i - 3)))) ++
      (10L to 12L).map(i => (i, near(1, 0, 0.05 + 0.01 * (i - 10)))))
      .toDF("vec_id", "embedding")
    val oneRound = SimilarityOps.balancedAssign(embs, nCentroids = 3,
        capacity = 4L)
      .groupBy("cid").count().collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("count")).toMap
    assert(oneRound.values.max > 4L,
      s"constructed collision did not overflow one-round: $oneRound")
    val strict = SimilarityOps.balancedAssignStrict(embs, nCentroids = 3,
      capacity = 4L).collect()
    assert(strict.length == 12)
    assert(strict.map(_.getAs[Long]("vec_id")).distinct.length == 12)
    val loads = strict.groupBy(_.getAs[Long]("cid")).map {
      case (c, rows) => c -> rows.length
    }
    assert(loads.values.max <= 4, s"strict exceeded capacity: $loads")
    assert(strict.map(_.getAs[Long]("rank")).forall(r => r >= 1L && r <= 3L))
    // total capacity below corpus size must be rejected up front
    intercept[IllegalArgumentException] {
      SimilarityOps.balancedAssignStrict(embs, nCentroids = 3,
        capacity = 3L)
    }
  }

  test("curriculumOrder: stages order bands; key encodes stage | shuffle") {
    import spark.implicits._
    // long clean text (quality ~1) vs stopword soup (low quality)
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    val soup = "the a an of to and in is on for the a an of to"
    val docs = Seq((1L, clean), (2L, soup), (3L, clean))
      .toDF("doc_id", "text")
    val got = CurationOps.curriculumOrder(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("band"), r.getAs[Long]("stage"),
          r.getAs[Long]("sort_key"))).toMap
    assert(got(1L)._1 == 3L && got(1L)._2 == 0L) // top band, stage 0
    assert(got(2L)._1 == 0L && got(2L)._2 == 3L) // low band, last stage
    // key layout: stage in the high bits, 40-bit shuffle below
    got.values.foreach { case (_, stage, key) =>
      assert(key >> 40 == stage)
      assert((key & ((1L << 40) - 1)) >= 0L)
    }
    // clean docs sort before soup regardless of id hash
    assert(got(1L)._3 < got(2L)._3 && got(3L)._3 < got(2L)._3)
    // deterministic under repartitioning
    val again = CurationOps.curriculumOrder(docs.repartition(7))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("sort_key")).toMap
    assert(got.view.mapValues(_._3).toMap == again)
  }

  test("dsirWeights: exact smoothing on singletons; target affinity wins") {
    import spark.implicits._
    // single doc, single shingle: affinity is bucket-independent —
    // target: (1+1)*1e6 // (1+64); non-target: (0+1)*1e6 // (1+64)
    val one = Seq((0L, "a b", "src0")).toDF("doc_id", "text", "source")
    val r1 = CurationOps.dsirWeights(one, "src0").collect().head
    assert(r1.getAs[Long]("n_feat") == 1L)
    assert(r1.getAs[Long]("weight") == 2000000L / 65)
    val r0 = CurationOps.dsirWeights(one, "other").collect().head
    assert(r0.getAs[Long]("weight") == 1000000L / 65)
    // distinctive target vocabulary: every src0 doc scores a higher
    // per-feature weight than every src1 doc (their buckets carry
    // target mass; disjoint vocabularies keep buckets separate w.h.p.
    // but the assertion only needs target-side dominance)
    val docs = ((0L until 10L).map(i =>
        (i, s"tgt$i alpha alpha bravo bravo tgt$i", "src0")) ++
      (10L until 30L).map(i =>
        (i, s"oth$i xray xray yankee yankee oth$i", "src1")))
      .toDF("doc_id", "text", "source")
    val w = CurationOps.dsirWeights(docs, "src0").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("weight_per_feat_ppm")).toMap
    val tgtMin = (0L until 10L).map(w).min
    val othMax = (10L until 30L).map(w).max
    assert(tgtMin > othMax,
      s"target per-feat weight $tgtMin must exceed $othMax")
    // feature accounting: n_feat sums to the distinct (doc, shingle)
    // explosion size
    val nFeatSum = CurationOps.dsirWeights(docs, "src0")
      .agg(sum($"n_feat")).as[Long].head()
    val shCount = DedupOps.docShingles(docs).distinct().count()
    assert(nFeatSum == shCount)
  }

  test("mmrRerank: redundancy demotes the duplicate candidate") {
    import spark.implicits._
    // query 0 = +x. candidates: 1 and 2 identical (rel .9, mutual
    // sim 1), 3 equally relevant but on the other side of x (rel .9,
    // sim to 1 only .62). Pure relevance ranks 1,2,3 by id-tiebreak;
    // MMR at λ=.7 must pick 1, then 3 (diversity), then 2.
    def v(x: Double, y: Double): Array[Float] = {
      val a = Array.fill(64)(0f); a(0) = x.toFloat; a(1) = y.toFloat; a
    }
    val embs = Seq(
      (0L, v(1.0, 0.0)),
      (1L, v(0.9, math.sqrt(0.19))),
      (2L, v(0.9, math.sqrt(0.19))),
      (3L, v(0.9, -math.sqrt(0.19)))).toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrRerank(embs, nQueries = 1,
        poolSize = 3, k = 3)
      .orderBy($"sel_rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq ==
      Seq(1L, 3L, 2L))
    // rank 1 has red 0 by definition: score = λ·rel exactly
    val r1 = got.head
    assert(math.abs(r1.getAs[Double]("score_x1m") -
      700000.0 * r1.getAs[Double]("rel")) < 1e-6)
    // the duplicate's score reflects red ≈ 1: λ·rel − (1−λ)·1
    val r3 = got.last
    assert(r3.getAs[Double]("score_x1m") <
      700000.0 * r3.getAs[Double]("rel") - 299000.0)
  }

  test("semanticDedup: rank-gated within-cell dups; rep kept") {
    import spark.implicits._
    // centroids = corpus rows 0 (+x) and 1 (+y). vec 2 is nearly
    // parallel to 0 (cos ≈ .994 ≥ τ=.35 → dup); vec 3 lands in cell
    // 0 (cos .30 to +x beats 0 to +y) but is below τ to BOTH
    // better-ranked members → kept. vec 1 is alone in its cell.
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    val embs = Seq(
      (0L, v(0 -> 1f)), (1L, v(1 -> 1f)),
      (2L, v(0 -> 0.9f, 2 -> 0.1f)),
      (3L, v(0 -> 0.3f, 3 -> 0.95f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticDedup(embs, nCells = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Long]("crnk"),
          r.getAs[Long]("best_better_ppm"), r.getAs[Boolean]("is_dup"))))
      .toMap
    assert(got.size == 4)
    // centroid-closest member of the dup group is the KEPT rep —
    // asymmetry: cos(0,2) ≥ τ flags only the worse-ranked vec 2
    assert(got(0L) == ((0L, 1L, -1000000L, false)))
    val (c2, r2, bp2, d2) = got(2L)
    assert(c2 == 0L && r2 == 2L && d2 && bp2 >= 990000L)
    val (c3, _, bp3, d3) = got(3L)
    assert(c3 == 0L && !d3 && bp3 < 350000L && bp3 >= 0L)
    // a cell's rank 1 is never a dup, even alone
    assert(got(1L) == ((1L, 1L, -1000000L, false)))
  }
}
