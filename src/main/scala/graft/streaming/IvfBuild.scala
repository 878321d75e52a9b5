package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, SimilarityOps}

/** End-to-end IVF index BUILD pipeline — the 100 TB ANN story as one
  * service instead of five parts: k-means‖ seeding
  * ([[CurationOps.kmeansParallelSeeds]], fixed round count — corpus
  * scans independent of nlist) → Lloyd refinement
  * ([[CurationOps.kmeansFrom]]) → STRICT capacity-bounded cell
  * assignment ([[SimilarityOps.balancedAssignStrictTo]], deferred
  * acceptance — every cell ends ≤ capacity whatever the corpus skew,
  * so no serving partition is a straggler) → the cid-partitioned
  * serving table [[IncrementalAnn]] reads, appends to
  * ([[IncrementalAnn.indexBatch]] against the frozen centroids) and
  * searches ([[IncrementalAnn.searchTopK]]).
  *
  * Why balanced cells matter at build time and not just query time:
  * real embedding corpora cluster heavily, and nearest-centroid
  * assignment piles the hot region into a few giant cells — those
  * become both the slowest partitions of the build write AND the
  * cells every query in the hot region must scan. The capacity bound
  * trades a little first-choice recall (spilled vectors land in their
  * next-nearest cell — buy it back with nProbe) for a hard per-cell
  * work bound; [[buildReport]] carries how much actually spilled.
  *
  * Sizing doctrine, per the inverted-file literature: nlist ≈ √n
  * (cells of ≈√n vectors balance the centroid-ranking term — every
  * query scores all nlist centroids — against the probed-cell scan
  * term), capacity = ceil(slack·n/nlist) with a little slack so the
  * balancer is not forced to place tail vectors in far cells.
  *
  * Ref behavior class: stream-cdc (the reference pipeline) has no
  * vector surface; this is part of the LLM-pipeline extension the
  * engine adds (SURVEY §2.3).
  */
object IvfBuild {

  /** What [[build]] did: corpus size, cell geometry, and how much the
    * capacity bound displaced. `maxCell ≤ capacity` is the contract
    * the spec pins; `spilled` = vectors not in their first-choice
    * cell (rank > 1). */
  final case class BuildReport(table: String, nVectors: Long,
      nlist: Int, capacity: Long, nCells: Long, maxCell: Long,
      spilled: Long)

  /** Train the coarse codebook: k-means‖ seeds reduced to `nlist`,
    * refined with `lloydIters` Lloyd passes. Corpus scans:
    * (seedRounds + 1) for seeding + 2·lloydIters for refinement —
    * independent of nlist, which is the property that makes real
    * nlist (≈√n: 10⁴-10⁵ on a 100 TB corpus) affordable; a maximin /
    * sequential seeder would pay nlist sequential jobs. Returns the
    * k-row (cid, ce) frame, localCheckpointed (metadata-sized) so
    * downstream counts and broadcasts never re-run the pipeline. */
  def trainCentroids(embs: DataFrame, nlist: Int, dim: Int = 64,
      seedRounds: Int = 4, oversample: Int = 16, lloydIters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    val seeds = CurationOps.kmeansParallelSeeds(embs, k = nlist,
      rounds = seedRounds, oversample = oversample, dim = dim)
    val init = embs
      .join(seeds.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    CurationOps.kmeansFrom(embs, init, dim, lloydIters, scale)._2
      .localCheckpoint()
  }

  /** Build the serving index under `table`: train (unless `centroids`
    * is supplied), balance, write `{table}_centroids` + the
    * cid-partitioned index. Overwrites any existing pair — for a
    * blue/green swap of a LIVE index, build under a fresh name and
    * flip readers, exactly as [[IncrementalAnn.retrainTo]] documents
    * (this builder IS retrainTo's trained-centroid front end plus the
    * skew-bounded assignment). The write is one corpus-sized keyed
    * shuffle (repartition on cid) into partition-pruned parquet; the
    * balancer's extra cost over plain nearest-assignment is its
    * displacement rounds — bounded, measured in the Sf1 probe. */
  def build(spark: SparkSession, table: String, embs: DataFrame,
      nlist: Int, dim: Int = 64, seedRounds: Int = 4,
      oversample: Int = 16, lloydIters: Int = 2,
      capacitySlack: Double = 1.3, maxRounds: Int = 64,
      centroids: Option[DataFrame] = None): BuildReport = {
    require(nlist >= 2, "an inverted file needs >= 2 cells")
    require(capacitySlack >= 1.0, "slack < 1 cannot hold the corpus")
    val cents = centroids.getOrElse(
      trainCentroids(embs, nlist, dim, seedRounds, oversample,
        lloydIters))
    val n = embs.count()
    val capacity = math.max(1L,
      math.ceil(n.toDouble * capacitySlack / nlist).toLong)
    val strict = SimilarityOps.balancedAssignStrictTo(embs, cents,
      dim, capacity, maxRounds, nCentroidsHint = Some(nlist))
    CdcMerge.dropStateTable(spark, table)
    CdcMerge.dropStateTable(spark, IncrementalAnn.centTable(table))
    cents.coalesce(1)
      .write.format("parquet")
      .saveAsTable(IncrementalAnn.centTable(table))
    val rows = embs
      .select(col("vec_id"), col("embedding"),
        SimilarityOps.norm(col("embedding"), dim).as("en"))
      .join(strict.select(col("vec_id"), col("cid"), col("rank")),
        Seq("vec_id"))
    rows.select(col("vec_id"), col("embedding"), col("en"), col("cid"))
      .repartition(col("cid"))
      .write.format("parquet").partitionBy("cid").saveAsTable(table)
    // geometry off the WRITTEN table (cell counts are nlist-sized);
    // spill off the assignment (rank > 1 = displaced by the bound)
    val geom = spark.table(table).groupBy("cid")
      .agg(count(lit(1)).as("cn"))
      .agg(count(lit(1)).as("cells"), max(col("cn")).as("mx"))
      .head()
    val spilled = strict.filter(col("rank") > 1).count()
    BuildReport(table, n, nlist, capacity, geom.getLong(0),
      geom.getLong(1), spilled)
  }

  /** Exact brute-force cosine top-k for a query frame — the
    * acceptance referee for the recall ladder (probe-count vs recall
    * curve): every corpus vector scored against every query. Queries
    * broadcast (a query set is always tiny next to the corpus);
    * corpus never shuffles except the per-query top-k window.
    * `queries` is (query_id, q_emb); returns
    * (query_id, neighbor_id, rnk, cos). */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame,
      dim: Int = 64, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    embs.select(col("vec_id"), col("embedding"),
        SimilarityOps.norm(col("embedding"), dim).as("en"))
      .crossJoin(broadcast(queries.select(col("query_id"),
        col("q_emb"), SimilarityOps.norm(col("q_emb"), dim).as("qn"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        SimilarityOps.dot(col("q_emb"), col("embedding"), dim) /
          (col("qn") * col("en")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), col("cos"))
  }

  /** Measured recall@k of the built index at one probe width:
    * fraction of the exact top-k the probed search returns, averaged
    * over the query set (in ppm — the integer-exact reporting
    * doctrine). One row: (n_probe, recall_ppm). */
  def recallAt(spark: SparkSession, table: String, embs: DataFrame,
      queries: DataFrame, dim: Int = 64, nProbe: Int = 2,
      k: Int = 5): DataFrame = {
    val exact = bruteForceTopK(embs, queries, dim, k)
      .select(col("query_id"), col("neighbor_id"))
    val got = IncrementalAnn.searchTopK(spark, table, queries, dim,
        nProbe, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(got, Seq("query_id", "neighbor_id"),
      "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(lit(nProbe).as("n_probe"),
        expr("n_hits * 1000000 div n_exact").as("recall_ppm"))
  }
}
