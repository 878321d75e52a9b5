package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.GraphOps

/** Warm-started PageRank over the maintained graph: the warm start
  * must land on the IDENTICAL integer fixed point as a cold start —
  * in no more rounds — and the rank table must serve
  * snapshot-consistently (refuse when lagging the graph). */
class IncrementalPageRankSpec extends SparkSpec {

  private val graphT = "ipr_knn"
  private val rankT = "ipr_rank"

  private def embs: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select("vec_id", "embedding")

  private def part(lo: Long, hi: Long) =
    embs.filter(col("vec_id") >= lo && col("vec_id") < hi)

  private def verts(hi: Long) =
    embs.filter(col("vec_id") < hi).select(col("vec_id").as("vid"))

  private def ranks(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("vid", "deg_out", "pr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("warm refresh == cold fixed point exactly, in no more rounds; " +
      "serve refuses on a lagging rank table") {
    (IncrementalKnnGraph.tables(graphT) ++
      IncrementalPageRank.tables(rankT))
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalKnnGraph.applyBatch(spark, graphT, part(0, 450), 0L)
    // cold refresh at wave 0
    val (wm0, rounds0) = IncrementalPageRank.refresh(spark, graphT,
      rankT, verts(450))
    assert(wm0 == 0L && rounds0 > 1)
    // no-op when the graph hasn't moved
    assert(IncrementalPageRank.refresh(spark, graphT, rankT,
      verts(450)) == (0L, 0))
    val served0 =
      ranks(IncrementalPageRank.serve(spark, graphT, rankT))
    // the graph grows one wave (a ~10% delta — the per-ingest-wave
    // shape); a lagging rank table must REFUSE
    IncrementalKnnGraph.applyBatch(spark, graphT,
      part(450, 1000000), 1L)
    val e = intercept[IllegalStateException] {
      IncrementalPageRank.serve(spark, graphT, rankT)
    }
    assert(e.getMessage.contains("refresh before serving"))
    // warm refresh: seeded from wave-0 ranks
    val (wm1, warmRounds) = IncrementalPageRank.refresh(spark, graphT,
      rankT, verts(Long.MaxValue))
    assert(wm1 == 1L)
    val warm = ranks(IncrementalPageRank.serve(spark, graphT, rankT))
    // cold reference on the same (maintained) edges: EXACT integer
    // equality — the fixed point is a property of the graph alone
    val edges = IncrementalKnnGraph.graphView(spark, graphT)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val (coldRanks, coldRounds) = GraphOps.pageRankFixedPoint(edges,
      verts(Long.MaxValue))
    assert(warm == ranks(coldRanks),
      "warm start landed on a different vector than the cold start")
    assert(warmRounds < coldRounds,
      s"warm start took $warmRounds rounds vs cold $coldRounds — " +
        "the previous ranks bought nothing")
    assert(warm != served0, "the grown graph must move some rank")
  }

  test("erasure bumps the graph version: the rank table refuses " +
      "until a refresh recomputes over the erased graph") {
    // continues on the previous test's state (graph at wave 1, rank
    // table refreshed). deleteVectors mutates the served graph WITHOUT
    // moving the fold watermark — versioning by the watermark alone
    // would let refresh() no-op and serve() hand out ranks still
    // naming the erased vectors (the r16 review).
    val delIds = Seq(11L, 108L, 205L)
    assert(IncrementalKnnGraph.deleteVectors(spark, graphT, delIds) ==
      delIds.size)
    val e = intercept[IllegalStateException] {
      IncrementalPageRank.serve(spark, graphT, rankT)
    }
    assert(e.getMessage.contains("refresh before serving"))
    val vertsNow = embs.filter(!col("vec_id").isin(delIds: _*))
      .select(col("vec_id").as("vid"))
    val (_, rounds) = IncrementalPageRank.refresh(spark, graphT,
      rankT, vertsNow)
    assert(rounds > 0, "post-delete refresh no-opped on a stale " +
      "watermark — the delete epoch is not in the version")
    val post = ranks(IncrementalPageRank.serve(spark, graphT, rankT))
    assert(delIds.forall(id => !post.contains(id)),
      "erased vectors still ranked")
    // exact: the fixed point of the post-delete maintained edges
    val edges = IncrementalKnnGraph.graphView(spark, graphT)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val (cold, _) = GraphOps.pageRankFixedPoint(edges, vertsNow)
    assert(post == ranks(cold),
      "post-delete warm refresh landed off the cold fixed point")
    // idempotent re-delete adds no ledger rows → version unchanged →
    // serve stays valid and refresh no-ops
    assert(IncrementalKnnGraph.deleteVectors(spark, graphT, delIds) ==
      0L)
    assert(IncrementalPageRank.refresh(spark, graphT, rankT,
      vertsNow)._2 == 0)
    assert(ranks(IncrementalPageRank.serve(spark, graphT, rankT)) ==
      post)
  }
}
