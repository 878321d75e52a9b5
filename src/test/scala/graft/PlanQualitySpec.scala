package graft

import graft.SparkSpec
import graft.sources.Tables

/** Plan-quality regression guards: the properties that matter at 100 TB,
  * asserted on every registered query's physical plan (SCALE.md).
  */
class PlanQualitySpec extends SparkSpec {

  private lazy val plans: Map[String, String] = {
    // building a query's final plan runs its harness (maintained-index
    // queries fold real batches first), so this map is a sf0.001
    // mini-sweep — measured 468 s when built sequentially (r17 test
    // baseline, ~1/3 of the whole suite). The harnesses are mutually
    // independent (per-query table prefixes, per-table bridge views,
    // thread-safe caches), so build them on a small pool and let
    // Spark's scheduler overlap the tiny fold jobs (guide §2.6) — the
    // wall is driver/fold latency, not the 4 local cores.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = SparkEntry.registry.map { q =>
        scala.concurrent.Future(
          q.name ->
            q.run(spark, sf("sf0.001")).queryExecution.executedPlan
              .toString)
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
  }

  test("registry: unique names, every query has an oracle") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct)}")
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries outside the hard correctness signal: $noOracle")
  }

  test("no cartesian products anywhere") {
    plans.foreach { case (name, plan) =>
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("nested-loop joins only where a 1-row/bounded build is intended") {
    // q20's scalar-subquery cross join broadcasts a single aggregate
    // row; emb01's brute-force intentionally broadcasts the ≤8-row
    // query set against the corpus scan (the exact-baseline ANN path);
    // emb04's IVF assignment broadcasts the 8-row centroid set;
    // doc09 broadcasts the 1-row corpus count for the IDF weight;
    // doc19 broadcasts the 1-row (n_docs, sum_dl) stats for BM25;
    // doc10 broadcasts the 1-row doc count for the stop-shingle filter;
    // cdc15's superbucket carry theta-joins the idRange/(bucket·super)-
    // row superbucket aggregate against itself (broadcast, tiny);
    // emb08's k-means assignment broadcasts the 8-row centroid set.
    // emb09's Lloyd step broadcasts the same 8-row centroid set
    val allowed = Set("q20_scalar_subquery", "emb01_cosine_topk",
      "emb04_ivf_topk", "emb05_ivf_multiprobe", "doc09_top_terms",
      "doc10_chartrigram_neardup", "cdc15_gap_detect",
      "emb08_cluster_assign", "emb09_kmeans_step", "emb10_cluster_sample",
      // doc19: 1-row stats broadcast; q46: bounded 5×52 spine build
      "doc19_bm25", "q46_gap_fill",
      // emb13: the IVF coarse stage broadcasts the same 8-row
      // centroid set as emb04/emb08 (per-query distance tables and
      // codes then flow through equi-joins only)
      "emb13_ivfpq",
      // emb14: incremental IVF — batch assignment and query-cell
      // ranking broadcast the same frozen ≤8-row centroid table; the
      // search itself is a cid equi-join
      "emb14_incremental_ivf",
      // emb15: filtered ANN — the same ≤8-row centroid broadcast as
      // emb05, with the metadata predicate applied scan-side
      "emb15_filtered_ann",
      // emb16: prefix re-rank — the emb01-style ≤8-row query-set
      // broadcast against the corpus scan; the re-rank stage then
      // touches only shortlist-sized windows
      "emb16_prefix_rerank",
      // emb18: recall@k audit — runs bruteForceTopK (exact ground
      // truth) and lshTopK over the same ≤8-row query set; both
      // intend the emb01-class bounded query-set broadcast
      "emb18_ann_recall",
      // emb19: binary-quantization Hamming shortlist — the same
      // emb01-class ≤8-row query-set broadcast against the corpus
      // scan (the Hamming scan is the cheap stage; the re-rank
      // touches shortlist-sized windows only)
      "emb19_binary_hamming",
      // emb21: balanced assignment — the emb04-class ≤8-row centroid
      // broadcast (rank-1/rank-2 choices from one ranked pass)
      "emb21_balanced_assign",
      // emb23: k-means|| coverage-weight pass — broadcasts the sampled
      // candidate set (≈ rounds·oversample + 1 ≈ 65 rows, control-
      // plane bounded) against one corpus scan, the same shape as the
      // emb04/emb08 centroid broadcasts
      "emb23_kmeanspar_seeds",
      // emb25: strict balanced assignment — the emb21-class ≤8-row
      // centroid broadcast building the ranked-choice table
      "emb25_balanced_strict",
      // doc36: containment — the doc10-class 1-row doc-count
      // broadcast gating the stop-shingle filter; the inverted-index
      // candidate join itself is an equi-join on the shingle
      "doc36_containment",
      // emb26: MMR — the pool comes from bruteForceTopK, the
      // emb01-class ≤8-row query-set broadcast; pairwise sims and
      // all k greedy rounds are query_id equi-joins
      "emb26_mmr_rerank",
      // emb27: semantic dedup — the emb04/emb08-class ≤8-row centroid
      // broadcast for cell assignment; the within-cell pairwise pass
      // is a cid equi-join (cell-bounded, the SemDeDup contract)
      "emb27_semantic_dedup",
      // q59: z-order layout — the q20-class 1-row corpus-extremes
      // aggregate broadcast against the scan; the key itself is pure
      // bit arithmetic, no other join anywhere in the plan
      "q59_zorder_layout",
      // doc39/cdc33: CMS report — the doc09-class 1-row total-count
      // broadcast for the εN band; grid probes are equi-joins
      "doc39_cms_counts", "cdc33_incremental_cms",
      // emb29: kNN graph — the emb04/emb08-class ≤8-row centroid
      // broadcast for cell assignment; candidate generation is a cid
      // equi-join, ranking a per-vector window
      "emb29_knn_graph",
      // emb32/emb33: the capped variants of emb29/emb27 — the same
      // ≤8-row centroid broadcast, now through balancedAssignStrict's
      // ranked-choice pass (the emb25 class); the pairwise stages
      // stay cid equi-joins
      "emb32_knn_graph_capped", "emb33_semdedup_capped",
      // emb34: the IVF training pipeline — the emb23-class candidate
      // broadcast (seeding), the emb08-class ≤8-row centroid
      // broadcasts (Lloyd + the strict ranked-choice pass); nothing
      // corpus-sized ever builds a nested loop
      "emb34_ivf_pipeline",
      // emb35/emb36: label propagation / label-margin audit — the
      // emb08-class centroid broadcast (8 cell seeds; 10 per-label
      // centroids); candidates and margins flow through equi-joins
      // and per-vector windows only
      "emb35_knn_classify", "emb36_label_margin",
      // emb37/emb38: graph analytics whose EDGE LIST comes from
      // knnGraph (the emb29-class ≤8-row centroid broadcast); emb37
      // additionally broadcasts the 1-row vertex count for the
      // teleport term (q20 class). The PageRank mat-vec rounds and
      // the triangle wedge/closure joins are vertex-id equi-joins
      "emb37_graph_pagerank", "emb38_triangle_count",
      // doc43: grid skyline — the q59-class 1-row corpus-extremes
      // broadcast, the ≤g^d-row cell-corner prune join, and the
      // final dominance test whose operands are the PRUNED shell
      // (the n² join on the raw corpus never forms)
      "doc43_pareto_frontier",
      // emb39: TrustRank — the emb37 plan with a seed-gated teleport
      // (same knnGraph centroid broadcast + 1-row seed count)
      "emb39_trustrank",
      // cdc37: the doc43 grid skyline folded per batch (same
      // control-plane-sized corner-prune joins, frontier-sized shell)
      "cdc37_incremental_skyline",
      // emb40/emb41: LPA communities / BFS hop distance — the same
      // knnGraph edge-list provenance as emb37 (centroid broadcast);
      // every propagation round is a vertex-id equi-join
      "emb40_community_lpa", "emb41_hop_distance",
      // emb42: graph beam search — knnGraph edge-list provenance
      // (centroid broadcast); the search rounds are vertex-id
      // equi-joins with per-query bounded windows
      "emb42_graph_beam_search",
      // emb43: the cell-seeded hybrid — same provenance, plus the
      // emb04-class centroid broadcast for the seeding assignment
      "emb43_beam_cell_seeded",
      // emb44: community sampling over emb40's LPA labels — same
      // knnGraph provenance; the two-level top-k is windows only
      "emb44_community_sample",
      // emb45: dangling-mass PageRank — emb37's knnGraph provenance
      // (centroid broadcast) plus a 1-row dangling-sum broadcast per
      // round (control-plane scalar, the intended bounded build)
      "emb45_pagerank_dangling",
      // doc49: rarity keywords — the 1-row corpus-count broadcast
      // (the df join itself is a keyed equi-join)
      "doc49_rarity_keywords",
      // doc51/cdc48: RRF fusion — RetrievalOps.rankedTopK's
      // count-better rank is a DELIBERATE ≤20×20 nested-loop over
      // the TakeOrdered survivors (the window-free rank for
      // LIMIT-sized lists), plus doc19's 1-row stats broadcast and
      // (cdc48) the ≤8-row centroid broadcast of searchTopK
      "doc51_rrf_fusion", "cdc48_rrf_fusion_view",
      // cdc49: emb37's PageRank over the MAINTAINED graph — the same
      // ≤8-row centroid broadcasts (fold assignment + serve), plus
      // emb37's 1-row vertex-count teleport broadcast
      "cdc49_pagerank_view")
    plans.foreach { case (name, plan) =>
      if (!allowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("filter+projection queries push filters to the parquet scan") {
    val plan = plans("q02_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"))
    // pruned read schema: 6 of 10 lineitem columns
    assert(!plan.contains("l_shipdate"), "unpruned column read")
  }

  test("dimension joins broadcast") {
    assert(plans("q04_broadcast_join").contains("BroadcastHashJoin"))
    assert(plans("q05_multi_join").contains("BroadcastHashJoin"))
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plans("q14_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("approx percentile path has no per-group full-value buffer") {
    import graft.operators.PercentileOps
    val df = PercentileOps.groupPercentiles(
      Tables.load(spark, sf("sf0.001"), "lineitem"),
      "l_returnflag", "l_extendedprice", Seq(0.5, 0.95))
    val aggExprs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.map(_.toString).mkString(";")
    }.mkString(";")
    // ApproximatePercentile = bounded GK sketch, merged associatively;
    // Percentile = OpenHashMap of every value per group (the 100 TB
    // scale-killer this guards against)
    assert(aggExprs.contains("approx_percentile"))
    assert(!aggExprs.replace("approx_percentile", "").contains("percentile("),
      s"exact percentile (full-value buffer) in approx path: $aggExprs")
    // and it partial-aggregates: two HashAggregate stages around the
    // exchange, like any sum/count
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("partial_approx_percentile") ||
      phys.contains("ObjectHashAggregate"), phys)
  }

  test("emb24 sketch winsorize plans the sketch, not a value buffer") {
    // the registered 100 TB winsorize path must stay on
    // approx_percentile (GK sketch, partial-aggregated): a silent
    // regression to exact percentile would buffer corpus/dim values
    // per group on one reducer
    val df = SparkEntry.queries("emb24_winsorize_sketch")(
      spark, sf("sf0.001"))
    val aggExprs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.map(_.toString).mkString(";")
    }.mkString(";")
    assert(aggExprs.contains("approx_percentile"))
    assert(!aggExprs.replace("approx_percentile", "").contains("percentile("),
      s"exact percentile (full-value buffer) in emb24: $aggExprs")
  }

  test("exact percentile mode is gated behind allowExact") {
    import graft.operators.PercentileOps
    intercept[IllegalArgumentException] {
      PercentileOps.groupPercentiles(
        Tables.load(spark, sf("sf0.001"), "lineitem"),
        "l_returnflag", "l_extendedprice", Seq(0.5),
        mode = PercentileOps.Exact)
    }
  }

  test("every window is partitioned (no single-task global windows)") {
    import org.apache.spark.sql.catalyst.plans.logical
    SparkEntry.registry.foreach { q =>
      // the trailing .orderBy (oracle determinism) is a global SORT,
      // which AQE/TakeOrdered handle; what must never appear is a
      // partition-less WINDOW — every row of its input funnels through
      // ONE task regardless of cluster size
      q.run(spark, sf("sf0.001")).queryExecution.optimizedPlan.foreach {
        case w: logical.Window =>
          assert(w.partitionSpec.nonEmpty,
            s"${q.name}: Window with empty partitionBy")
        case w: logical.WindowGroupLimit =>
          assert(w.partitionSpec.nonEmpty,
            s"${q.name}: WindowGroupLimit with empty partitionBy")
        case _ => ()
      }
    }
  }

  test("dynamic partition pruning fires on partition-key dim joins") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // fact partitioned on the join key; dim carries a selective filter
    // only known at runtime — the scan must plan a dynamicpruning
    // subquery in its PartitionFilters, the mechanism that keeps a
    // 100 TB fact scan from reading partitions the dim filter excludes
    graft.streaming.CdcMerge.dropStateTable(spark, "dpp_fact")
    // sf0.01: DPP's benefit heuristic skips sub-broadcast-sized facts
    Tables.load(spark, sf("sf0.01"), "orders")
      .write.mode("overwrite").format("parquet")
      .partitionBy("o_orderstatus").saveAsTable("dpp_fact")
    // the dim must be a SCANNED relation: an in-memory LocalRelation
    // constant-folds its filter away and DPP (which keys off a Filter
    // on the dim side) never inserts the pruning subquery
    val dimPath = tmpDir("dpp-dim")
    Seq(("F", "closed"), ("O", "open")).toDF("st", "label")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.table("dpp_fact")
      .join(dim.filter(col("label") === "closed"),
        col("o_orderstatus") === col("st"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(2000)}")
    assert(joined.count() ==
      Tables.load(spark, sf("sf0.01"), "orders")
        .filter(col("o_orderstatus") === "F").count())
  }

  test("runtime bloom filter prunes the big side of selective joins") {
    import org.apache.spark.sql.functions._
    // fact-fact shuffle join with a selective filter on one side: the
    // optimizer must inject a bloom filter from the filtered side into
    // the big side's scan — at 100 TB this skips most of the fact read
    // for row-level-selective (non-partition) predicates, the runtime
    // complement of DPP. Thresholds are lowered because the test data
    // is below the defaults (10 MB creation / 10 GB application),
    // which are sized for exactly the cluster case.
    val overrides = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1MB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = overrides.map { case (k, _) => k -> spark.conf.get(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sf0.1: plan-only (never executed), and the sf0.01 scan sits
      // below even the lowered application-side threshold
      val li = Tables.load(spark, sf("sf0.1"), "lineitem")
      val sel = Tables.load(spark, sf("sf0.1"), "orders")
        .filter(col("o_totalprice") > 500000.0)
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"no runtime bloom filter in:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed co-located join needs no exchange") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf("sf0.001"), "orders")
        .write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_bucketed")
      Tables.load(spark, sf("sf0.001"), "customer")
        .write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        Tables.load(spark, sf("sf0.001"), "orders").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
