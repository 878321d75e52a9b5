package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN parameter auto-tuning: choose LSH (planes, tables) or IVF
  * nProbe from a MEASURED recall estimate on a sample, instead of
  * guessing. `tools/RecallProbe` prints the recall ladder for a human;
  * this walks the same ladder programmatically and returns the
  * cheapest configuration meeting a target.
  *
  * Scale contract: tuning is an OFFLINE, sample-sized procedure — the
  * caller passes a sampled corpus (e.g. `embs.sample(0.001, seed)`;
  * thousands of vectors suffice for a stable recall estimate), and the
  * per-query neighbor sets collected here are `nQueries × k` rows.
  * Nothing in this object ever touches the full corpus; the tuned
  * parameters then drive the distributed [[SimilarityOps]] paths at
  * full scale. Recall estimated on a uniform sample transfers because
  * both the LSH collision probability and the IVF cell-boundary loss
  * are properties of the vector DISTRIBUTION, not the corpus size —
  * while candidate cost scales with corpus size, which is exactly why
  * the cheapest passing config is the right pick.
  */
object AnnTuner {

  final case class TunedLsh(planes: Int, tables: Int, recall: Double,
      ladderRung: Int)
  final case class TunedIvf(nProbe: Int, recall: Double)

  /** Default (planes, tables) ladder, ordered cheapest first: expected
    * candidate volume per table ∝ n/2^planes, total ∝ tables/2^planes.
    * Recall grows down the ladder (OR-amplification across tables,
    * fewer planes → wider buckets); cost grows with it. */
  val defaultLshLadder: Seq[(Int, Int)] = Seq(
    (8, 2), (8, 4), (6, 2), (6, 4), (8, 8), (6, 8), (4, 4), (4, 8))

  private def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallOf(approx: Map[Long, Set[Long]],
      truth: Map[Long, Set[Long]]): Double = {
    val per = truth.toSeq.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }

  /** Measured recall@k of multi-table LSH vs brute-force truth on the
    * sample. Exposed so callers can audit a chosen config. */
  def measuredLshRecall(sample: DataFrame, planes: Int, tables: Int,
      dim: Int = 64, nQueries: Int = 8, k: Int = 5): Double =
    recallOf(
      neighborSets(SimilarityOps.lshTopKMulti(sample, dim, planes,
        tables, nQueries, k)),
      neighborSets(SimilarityOps.bruteForceTopK(sample, dim, nQueries, k)))

  /** Cheapest (planes, tables) on the ladder whose measured sample
    * recall meets `targetRecall`; falls back to the best-recall rung if
    * none does (recall saturates below 1.0 when true neighbors are
    * near-orthogonal — the caller sees that in `.recall`). */
  def tuneLsh(sample: DataFrame, targetRecall: Double, dim: Int = 64,
      nQueries: Int = 8, k: Int = 5,
      ladder: Seq[(Int, Int)] = defaultLshLadder): TunedLsh = {
    val truth = neighborSets(
      SimilarityOps.bruteForceTopK(sample, dim, nQueries, k))
    var bestSoFar: Option[TunedLsh] = None
    var passing: Option[TunedLsh] = None
    val it = ladder.zipWithIndex.iterator
    while (passing.isEmpty && it.hasNext) {
      val ((planes, tables), rung) = it.next()
      val r = recallOf(
        neighborSets(SimilarityOps.lshTopKMulti(sample, dim, planes,
          tables, nQueries, k)),
        truth)
      val cand = TunedLsh(planes, tables, r, rung)
      if (r >= targetRecall) passing = Some(cand)
      else if (bestSoFar.forall(_.recall < r)) bestSoFar = Some(cand)
    }
    passing.orElse(bestSoFar).get
  }

  /** Smallest nProbe in 1..maxProbe whose measured sample recall meets
    * `targetRecall` (falls back to maxProbe). Probe cost is linear in
    * nProbe; recall is monotone in it, so this is a prefix walk. */
  def tuneIvf(sample: DataFrame, targetRecall: Double, dim: Int = 64,
      nCentroids: Int = 8, maxProbe: Int = 4, queryLo: Int = 8,
      queryHi: Int = 12, k: Int = 5): TunedIvf = {
    val truth = neighborSets(
      SimilarityOps.bruteForceTopK(sample, dim, queryHi, k)
        .filter(col("query_id") >= queryLo))
    var chosen: Option[TunedIvf] = None
    var p = 1
    while (p <= maxProbe && !chosen.exists(_.recall >= targetRecall)) {
      val r = recallOf(
        neighborSets(SimilarityOps.ivfTopKProbed(sample, dim,
          nCentroids, p, queryLo, queryHi, k)),
        truth)
      chosen = Some(TunedIvf(p, r))
      p += 1
    }
    chosen.get
  }

  final case class TunedK(k: Int, meanCos: Double)

  /** Smallest k on the ladder whose k-means assignment quality (mean
    * vector-to-centroid cosine after `iters` Lloyd passes on the
    * sample) meets `targetMeanCos`; falls back to the largest rung.
    * Same offline, sample-sized contract as [[tuneLsh]]/[[tuneIvf]]:
    * assignment quality is a property of the vector distribution, so
    * the chosen k transfers to the full-corpus
    * [[CurationOps.kmeans]] run, whose cost grows with k — which is
    * why the smallest passing k is the right pick. */
  def chooseK(sample: DataFrame, targetMeanCos: Double, dim: Int = 64,
      ladder: Seq[Int] = Seq(2, 4, 8, 16), iters: Int = 2): TunedK = {
    require(ladder.nonEmpty && ladder == ladder.sorted,
      "chooseK ladder must be ascending")
    var chosen: Option[TunedK] = None
    val it = ladder.iterator
    while (it.hasNext && !chosen.exists(_.meanCos >= targetMeanCos)) {
      val k = it.next()
      val (assigned, _) = CurationOps.kmeans(sample, dim, k, iters)
      val m = assigned.agg(avg(col("ccos"))).collect()(0).getDouble(0)
      chosen = Some(TunedK(k, m))
    }
    chosen.get
  }

  final case class TunedPq(candidates: Int, recall: Double)

  /** Cheapest ADC re-rank pool width on the ladder whose measured
    * sample recall meets `targetRecall`; falls back to the widest
    * rung. Pool width is THE recall lever for PQ (measured in
    * SCALE.md: codebook polish moves quantization MSE but not recall
    * on structureless corpora, pool width moves recall 0.35→0.95) and
    * also the cost axis — exact re-scoring touches `candidates` rows
    * per query — so the cheapest passing rung is the right pick, the
    * same economics as [[tuneLsh]]. The codebook (first-k or
    * [[SimilarityOps.pqTrainCodebook]]-trained) is the caller's
    * choice; recall is measured against whatever is passed. */
  def tunePq(sample: DataFrame, targetRecall: Double,
      codebook: DataFrame, dim: Int = 64, m: Int = 8,
      queryLo: Int = 8, queryHi: Int = 12, k: Int = 5,
      ladder: Seq[Int] = Seq(25, 50, 100, 200, 400, 800)): TunedPq = {
    require(ladder.nonEmpty && ladder == ladder.sorted,
      "tunePq ladder must be ascending")
    val truth = neighborSets(
      SimilarityOps.bruteForceTopK(sample, dim, queryHi, k)
        .filter(col("query_id") >= queryLo))
    var chosen: Option[TunedPq] = None
    val it = ladder.iterator
    while (it.hasNext && !chosen.exists(_.recall >= targetRecall)) {
      val c = it.next()
      val reranked = SimilarityOps.pqTopKRerankedWith(sample, codebook,
        dim, m, queryLo, queryHi, candidates = c, topK = k)
      chosen = Some(TunedPq(c, recallOf(neighborSets(reranked), truth)))
    }
    chosen.get
  }
}
