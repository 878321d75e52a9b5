package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, DedupOps, SimilarityOps}
import graft.streaming.{CdcMerge, IncrementalCC, IncrementalDsir,
  LakehouseSink}

/** sf1 (10×) knee probe for the round-9/10 operators — the companion
  * to [[Sf1Probe]] (which covers doc04/doc25/emb05/cdc16): same
  * derived /tmp corpus, same protocol (time each operator at sf0.1
  * and at the 10× derivation, print the knee indicator next to wall
  * time; rows land in SCALE.md).
  *
  * Probed here, with the indicator each one's 100 TB story hangs on:
  *  - doc31: verified pairs → connected components → leakage-safe
  *    split. Indicator: CC wall vs pair volume (rounds are
  *    O(diameter), so wall should track pairs ~linearly).
  *  - cdc28: [[IncrementalCC]] marginal-batch cost against the full
  *    label table (flat = labels maintainable at any corpus size).
  *  - doc32: [[IncrementalDsir]] marginal-batch cost vs the one-shot
  *    corpus profile it replaces.
  *  - doc33: curriculum range-sort materialization
  *    ([[LakehouseSink.clusterBy]] on sort_key) — the reader path;
  *    indicator: wall vs rows (one range exchange, no global window).
  *  - emb20 vs emb23: maximin seeding (k-1 sequential scans) against
  *    k-means‖ (rounds+1 scans) at the same k — the scan-count story
  *    measured, not asserted.
  *  - emb21/emb25: one-round balanced assignment vs strict deferred
  *    acceptance. Indicator: max cell load vs capacity, and the
  *    strict variant's wall (rounds are displacement-chain bounded).
  *  - emb22 sketch path: [[CurationOps.dimWinsorizeSketch]] — GK
  *    sketch over 10× the exploded values, bounded memory by
  *    construction; indicator is plain wall linearity.
  *  - doc34: [[CurationOps.bigramLmScore]] — the model table is the
  *    knee indicator (vocab grows 10× on the derived corpus).
  *  - doc36: [[DedupOps.containmentPairs]] — candidate/pair volume
  *    vs corpus (PPJoin bound ⇒ linear). This probe caught the
  *    bigram recall cliff that motivated the trigram default.
  *  - emb26: [[SimilarityOps.mmrRerank]] — pool²·k per-query work is
  *    corpus-independent; wall should be flat.
  *  - q58: [[graft.operators.SketchOps]] KMV build cost + estimate
  *    error at k=64 (the k-sweep convergence is recorded in SCALE.md).
  *
  * Usage: sbt "runMain graft.tools.Sf1ProbeR10 [sfDir] [outDir]"
  */
object Sf1ProbeR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    Sf1Probe.generateIfMissing(spark, sfDir, outDir)

    println(s"== sf0.1 ($sfDir) ==")
    probeAll(spark, sfDir)
    println(s"== sf1 ($outDir) ==")
    probeAll(spark, outDir)
    spark.stop()
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def probeAll(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nDocs = docs.count()
    val nVecs = embs.count()

    // doc31: pair list (amortized in production — IncrementalDedup
    // maintains it) + CC + split. Timed separately so the CC/split
    // increment is visible next to the pair-building cost.
    val pairs = {
      val (p, tPairs) = timed {
        val p = DedupOps.verifiedNearDups(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
      DedupOps.unpersistShingleCaches(blocking = true)
      val nPairs = p.count()
      val (splits, tSplit) = timed {
        CurationOps.leakageSafeSplit(docs, p)
          .groupBy("split").count().collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
      }
      println(f"PROBE doc31_split      $nDocs%8d docs  pairs: " +
        f"$nPairs%7d ($tPairs%6.1f s)  cc+split: $tSplit%6.1f s  " +
        splits.mkString(" "))
      p
    }

    // cdc28: incremental CC — 3-batch build, then the marginal cost
    // of one batch against the standing label table.
    {
      val table = "sf1probe_cclabels"
      IncrementalCC.dropTables(spark, table)
      def batch(i: Int) =
        pairs.filter(pmod(col("doc_a") + col("doc_b"), lit(4)) === i)
      val (_, tBuild) = timed {
        (0 until 3).foreach(i =>
          IncrementalCC.applyBatch(spark, table, batch(i), i.toLong))
      }
      val (_, tMarg) = timed {
        IncrementalCC.applyBatch(spark, table, batch(3), 3L)
      }
      val nLabels = IncrementalCC.readLabels(spark, table).count()
      println(f"PROBE cdc28_inc_cc     3-batch build: $tBuild%6.1f s   " +
        f"marginal batch: $tMarg%6.1f s   labels: $nLabels%d")
      IncrementalCC.dropTables(spark, table)
      pairs.unpersist()
    }

    // doc32: incremental DSIR — marginal batch vs the one-shot corpus
    // profile it replaces (the re-profile a nightly job would run).
    {
      val table = "sf1probe_dsir"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
      def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === i)
      val (_, tBuild) = timed {
        (0 until 3).foreach(i => IncrementalDsir.applyBatch(
          spark, table, batch(i), "src0", i.toLong))
      }
      val (_, tMarg) = timed {
        IncrementalDsir.applyBatch(spark, table, batch(3), "src0", 3L)
      }
      val (_, tOneShot) = timed {
        CurationOps.dsirWeights(docs, targetSource = "src0").count()
      }
      println(f"PROBE doc32_inc_dsir   3-batch build: $tBuild%6.1f s   " +
        f"marginal batch: $tMarg%6.1f s   one-shot re-profile: " +
        f"$tOneShot%6.1f s")
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    // doc33: curriculum reader materialization — range-sort the
    // corpus by the BIGINT sort key into stage-major files.
    {
      val table = "sf1probe_curriculum"
      Seq(table, s"${table}_clustering")
        .foreach(CdcMerge.dropStateTable(spark, _))
      val (_, tWrite) = timed {
        CurationOps.curriculumOrder(docs)
          .write.mode("overwrite").format("parquet").saveAsTable(table)
        LakehouseSink.clusterBy(spark, table,
          Seq("sort_key", "doc_id"), nFiles = 16)
      }
      val nFiles = spark.table(table).inputFiles.length
      println(f"PROBE doc33_reader     $nDocs%8d docs  curriculum " +
        f"write+clusterBy: $tWrite%6.1f s   files: $nFiles%d")
      Seq(table, s"${table}_clustering")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    // emb20 vs emb23 at the same k: sequential maximin vs fixed-round
    // k-means‖ — the scan-count contrast measured.
    {
      val k = 8
      val (_, tMaximin) = timed {
        CurationOps.farthestFirstSeeds(embs, k = k).count()
      }
      val (_, tPar) = timed {
        CurationOps.kmeansParallelSeeds(embs, k = k, rounds = 4,
          oversample = 16).count()
      }
      println(f"PROBE emb20v23_seeds   $nVecs%8d vecs  k=$k%d  " +
        f"maximin (k-1 scans): $tMaximin%6.1f s   " +
        f"k-means|| (5 scans): $tPar%6.1f s")
    }

    // emb21/emb25: one-round vs strict balance. Capacity at
    // ceil(n/k)+1 — tight enough that rebalancing has real work.
    {
      val k = 8
      val cap = nVecs / k + 1
      val (load1, t1) = timed {
        SimilarityOps.balancedAssign(embs, nCentroids = k,
            capacity = cap)
          .groupBy("cid").count().agg(max("count")).head().getLong(0)
      }
      val (loadS, tS) = timed {
        SimilarityOps.balancedAssignStrict(embs, nCentroids = k,
            capacity = cap)
          .groupBy("cid").count().agg(max("count")).head().getLong(0)
      }
      println(f"PROBE emb21v25_assign  $nVecs%8d vecs  cap=$cap%d  " +
        f"one-round: max load $load1%d ($t1%6.1f s)   " +
        f"strict: max load $loadS%d ($tS%6.1f s)")
    }

    // emb22 sketch path: GK-sketch winsorization bounds over 10× the
    // exploded values — wall should stay ~linear, memory bounded.
    {
      val (nBad, t) = timed {
        CurationOps.dimWinsorizeSketch(embs)
          .filter(!col("lo_in_band") || !col("hi_in_band")).count()
      }
      println(f"PROBE emb22_sketch     $nVecs%8d vecs  " +
        f"winsorize-sketch: $t%6.1f s   out-of-band dims: $nBad%d")
    }

    // doc34: bigram-LM scoring — two shuffles; the model table is the
    // knee indicator (the derived corpus grows the VOCABULARY 10×, so
    // model rows grow ~10× while per-doc work stays flat).
    {
      val (nModel, t) = timed {
        CurationOps.bigramLmScore(docs).count()
      }
      println(f"PROBE doc34_bigram_lm  $nDocs%8d docs  " +
        f"score-all: $t%6.1f s   scored rows: $nModel%d")
    }

    // doc36: prefix-filtered containment — candidate volume is the
    // knee indicator (bounded by prefix rows × maxDf by construction;
    // the 10× corpus has 10× the rare shingles, so candidates should
    // grow ~linearly, never quadratically).
    {
      val (nPairs, t) = timed {
        DedupOps.containmentPairs(docs).count()
      }
      DedupOps.unpersistShingleCaches(blocking = true)
      println(f"PROBE doc36_containment $nDocs%7d docs  " +
        f"pairs: $nPairs%6d ($t%6.1f s)")
    }

    // emb26: MMR re-rank — per-query work is poolSize²·k regardless
    // of corpus; only the pool-building brute-force stage scales with
    // input (swap in ANN at real scale), so wall tracks the corpus
    // scan ~linearly.
    {
      val (n, t) = timed {
        SimilarityOps.mmrRerank(embs).count()
      }
      println(f"PROBE emb26_mmr        $nVecs%8d vecs  " +
        f"selected: $n%d ($t%6.1f s)")
    }

    // q58/KMV: sketch build is distinct + TakeOrdered — the reduction
    // should stay ~flat beyond the distinct's shuffle cost; estimate
    // error is the quality indicator.
    {
      // only (event_type, user_id) needed — no ts rebuild (the derived
      // events were written by Spark with proper timestamp types, and
      // the sf0.1 originals prune ts out of the read anyway)
      val events = spark.read.parquet(s"$dir/events.parquet")
      val k = 64
      val u = events.filter(col("event_type") === "click")
        .select(col("user_id"))
      val ((est, exact), t) = timed {
        val sk = graft.operators.SketchOps.kmvSketch(u, "user_id", k)
          .withColumn("seg", lit("click"))
        val st = graft.operators.SketchOps.kmvStats(sk, "seg", k)
          .collect().head
        val theta = st.getAs[Long]("theta")
        val c = sk.filter(col("h") < theta).count()
        val est = c * graft.operators.SketchOps.Theta40 / theta
        (est, u.distinct().count())
      }
      println(f"PROBE q58_kmv          est: $est%8d   exact: " +
        f"$exact%8d   ($t%6.1f s, k=$k%d)")
    }

    // doc37: SymSpell fuzzy vocabulary — the knee indicators are the
    // VOCAB size (corpus-sublinear: the 10× derived corpus remints
    // word ids, so vocab grows ~10× here, the worst case) and the
    // candidate volume out of the deletion-variant equi-join (bounded
    // by bucket collisions, never V²).
    {
      val ((nVocab, nPairs), t) = timed {
        val v = DedupOps.vocab(docs).count()
        val p = DedupOps.fuzzyVocabPairs(docs).count()
        (v, p)
      }
      println(f"PROBE doc37_fuzzy      $nDocs%8d docs  vocab: " +
        f"$nVocab%7d  pairs: $nPairs%6d ($t%6.1f s)")
    }

    // cdc30: incremental HLL — marginal batch vs the one-shot rollup
    // re-scan it replaces (the q57 shape run from raw history).
    {
      val events = graft.sources.Tables.load(spark, dir, "events")
      val table = "sf1probe_hll"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
      def batch(i: Int) =
        events.filter(pmod(col("event_id"), lit(4)) === i)
      val (_, tBuild) = timed {
        (0 until 3).foreach(i => graft.streaming.IncrementalHll
          .applyBatch(spark, table, batch(i), i.toLong))
      }
      val (_, tMarg) = timed {
        graft.streaming.IncrementalHll.applyBatch(
          spark, table, batch(3), 3L)
      }
      val (_, tOneShot) = timed {
        events.groupBy(col("event_type"),
            org.apache.spark.sql.functions.to_date(col("ts")).as("day"))
          .agg(org.apache.spark.sql.functions
            .expr("hll_sketch_agg(user_id, 12)").as("sk"))
          .groupBy("event_type")
          .agg(org.apache.spark.sql.functions
            .expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
          .count()
      }
      println(f"PROBE cdc30_inc_hll    3-batch build: $tBuild%6.1f s   " +
        f"marginal batch: $tMarg%6.1f s   one-shot re-scan: " +
        f"$tOneShot%6.1f s")
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    // q59: z-order layout — key generation is one scan + a range
    // exchange; the quality indicator is bbox-level file pruning for
    // equi-depth qy bands vs a 1-D qx sort of the same data.
    {
      val events = graft.sources.Tables.load(spark, dir, "events")
      val zDir = java.nio.file.Files
        .createTempDirectory("probe-z").toString
      val xDir = java.nio.file.Files
        .createTempDirectory("probe-x").toString
      val (z, tKeys) = timed {
        val z = graft.operators.LayoutOps.zorderEvents(events)
        z.repartitionByRange(32, col("zkey"))
          .write.mode("overwrite").parquet(zDir)
        z
      }
      z.repartitionByRange(32, col("qx"))
        .write.mode("overwrite").parquet(xDir)
      def bboxes(d: String) = spark.read.parquet(d)
        .groupBy(org.apache.spark.sql.functions.input_file_name())
        .agg(min("qx").as("xlo"), max("qx").as("xhi"),
          min("qy").as("ylo"), max("qy").as("yhi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val zB = bboxes(zDir); val xB = bboxes(xDir)
      val edges = spark.read.parquet(zDir).stat
        .approxQuantile("qy", (0 to 8).map(_ / 8.0).toArray, 0.001)
        .map(_.toLong)
      def hits(bs: Array[(Long, Long, Long, Long)]) =
        (0 until 8).map { i =>
          val (plo, phi) = (edges(i),
            math.max(edges(i + 1) - 1, edges(i)))
          bs.count(b => b._4 >= plo && b._3 <= phi)
        }.sum
      println(f"PROBE q59_zorder       keys+write: $tKeys%6.1f s   " +
        f"qy-band files hit: zorder ${hits(zB)}%d/${8 * zB.length}%d " +
        f"vs 1-D ${hits(xB)}%d/${8 * xB.length}%d")
    }

    // doc39/cdc33: CMS — grid is d·w rows at ANY corpus; marginal
    // batch cost = batch scan + 1024-cell merge. Knee indicator is
    // plain wall linearity; the estimate-error band is oracle-pinned.
    {
      val words = docs
        .select(col("doc_id"),
          explode(split(trim(col("text")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val table = "sf1probe_cms"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
      def batch(i: Int) =
        words.filter(pmod(col("doc_id"), lit(4)) === i)
      val (_, tBuild) = timed {
        (0 until 3).foreach(i => graft.streaming.IncrementalCms
          .applyBatch(spark, table, batch(i), "word", i.toLong))
      }
      val (_, tMarg) = timed {
        graft.streaming.IncrementalCms.applyBatch(
          spark, table, batch(3), "word", 3L)
      }
      val (nCells, tOne) = timed {
        graft.operators.SketchOps.cmsGrid(words, "word").count()
      }
      println(f"PROBE cdc33_inc_cms    3-batch build: $tBuild%6.1f s   " +
        f"marginal batch: $tMarg%6.1f s   one-shot grid: $tOne%6.1f s" +
        f"   cells: $nCells%d")
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(CdcMerge.dropStateTable(spark, _))
    }

    // emb29: kNN graph — the knee is CANDIDATE VOLUME ≈ n·nProbe·
    // (n/nlist): at fixed nlist it grows quadratically, so nlist must
    // scale with the corpus (the IVF doctrine). Probe: nlist 8 at
    // sf0.1, 64 at the 10× corpus — per-vector candidates then stay
    // flat and wall tracks n.
    {
      val nlist = if (nVecs > 10000) 64 else 8
      val ((edges, nCands), t) = timed {
        val g = SimilarityOps.knnGraph(embs, nCentroids = nlist)
        val cands = nVecs * 2L * (nVecs / nlist)
        (g.count(), cands)
      }
      println(f"PROBE emb29_knn_graph  $nVecs%8d vecs  nlist=$nlist%d  " +
        f"edges: $edges%d ($t%6.1f s)  ~cands: $nCands%d")
    }

    // emb28: drift audit — one pass per side, metadata-sized output;
    // wall should track corpus linearly with no knee.
    {
      val ((nDims, maxTvd), t) = timed {
        val d = CurationOps.embeddingDrift(
          embs.filter(pmod(col("vec_id"), lit(2)) === 0),
          embs.filter(pmod(col("vec_id"), lit(2)) === 1))
        val rows = d.collect()
        (rows.length.toLong, rows.map(_.getLong(3)).max)
      }
      println(f"PROBE emb28_drift      $nVecs%8d vecs  dims: $nDims%d  " +
        f"max tvd_ppm: $maxTvd%d ($t%6.1f s)")
    }
  }
}
