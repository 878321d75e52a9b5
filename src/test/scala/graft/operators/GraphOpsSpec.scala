package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph analytics: PageRank fixed-point arithmetic (mass accounting,
  * sink behavior, partition-order independence) and degree-oriented
  * triangle counting (known graphs, hub wedge bound). */
class GraphOpsSpec extends SparkSpec {

  private val Scale = 1000000000000L

  test("pageRank: 3-cycle stays exactly uniform") {
    import spark.implicits._
    // a -> b -> c -> a: permutation graph, uniform is a fixed point
    // and the integer arithmetic preserves it EXACTLY (deg_out = 1,
    // no truncation loss inside the cycle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L).toDF("vid")
    val got = GraphOps.pageRank(edges, verts, iters = 5)
      .collect().map(r => r.getAs[Long]("vid") -> r.getAs[Long]("pr"))
      .toMap
    val p0 = Scale / 3
    val expected = (1 to 5).foldLeft(p0)((p, _) =>
      (Scale * 15L / 100L) / 3L + 85L * p / 100L)
    assert(got == Map(1L -> expected, 2L -> expected, 3L -> expected))
  }

  test("pageRank: star center accumulates, leaves hold teleport floor") {
    import spark.implicits._
    // leaves 2..5 all point at 1; 1 points back at 2 only
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val verts = (1L to 5L).toDF("vid")
    val rows = GraphOps.pageRank(edges, verts, iters = 3)
      .collect().map(r => r.getAs[Long]("vid") ->
        (r.getAs[Long]("deg_out"), r.getAs[Long]("pr"))).toMap
    val tele = (Scale * 15L / 100L) / 5L
    // center strictly dominates every leaf; unpointed-at leaves 3..5
    // sit exactly on the teleport floor
    assert(rows(1L)._2 > rows(2L)._2)
    Seq(3L, 4L, 5L).foreach { v =>
      assert(rows(v) == ((1L, tele)), s"leaf $v off the teleport floor")
    }
    assert(rows(1L)._1 == 1L && rows(2L)._1 == 1L)
  }

  test("pageRank: mass conserved up to truncation, partition-invariant") {
    import spark.implicits._
    // kNN-ish random-ish but FIXED graph: vid -> (vid*7+3) mod n, vid+1 mod n
    val n = 97L
    val verts = (0L until n).toDF("vid")
    val edges = (0L until n).flatMap(v =>
      Seq((v, (v * 7 + 3) % n), (v, (v + 1) % n))).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, verts, iters = 3)
    val total = pr.agg(sum("pr")).collect()(0).getLong(0)
    // every vertex has out-edges: loss is only integer truncation,
    // bounded by (deg_out-1 per contribution + div-100 + div-n) per
    // vertex per round — generously < 200·n·iters parts of 10^12
    assert(total <= Scale)
    assert(total > Scale - 200L * n * 3L, s"total=$total")
    // partition order cannot flip a digit: exact integer arithmetic
    val pr2 = GraphOps.pageRank(edges.repartition(13), verts.repartition(5),
      iters = 3)
    assert(pr.orderBy("vid").collect().toSeq ==
      pr2.orderBy("vid").collect().toSeq)
  }

  test("pageRank: sinks leak mass by default; redistributeDangling " +
      "conserves it to the truncation bound") {
    import spark.implicits._
    // vertices 0..9 in a line 0->1->...->8->9; 9 is a SINK
    val n = 10L
    val verts = (0L until n).toDF("vid")
    val edges = (0L until n - 1).map(v => (v, v + 1)).toDF("src", "dst")
    val leaky = GraphOps.pageRank(edges, verts, iters = 4)
      .agg(sum("pr")).collect()(0).getLong(0)
    val kept = GraphOps.pageRank(edges, verts, iters = 4,
        redistributeDangling = true)
      .agg(sum("pr")).collect()(0).getLong(0)
    // default: the sink's damped mass (~85%·pr(9) per round) is gone
    assert(leaky < Scale - Scale / 100L, s"leaky=$leaky")
    // redistribution: loss is integer truncation only — generously
    // < 300 parts per vertex per round of 10^12
    assert(kept <= Scale)
    assert(kept > Scale - 300L * n * 4L, s"kept=$kept")
  }

  test("pageRank: empty vertex/seed set fails fast, not all-null") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val none = Seq.empty[Long].toDF("vid")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, none, iters = 2)
    }
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges,
        Seq(1L, 2L).toDF("vid").withColumn("seed", lit(false)),
        iters = 2)
    }
  }

  test("personalizedPageRank: all-seeds degenerates to pageRank") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L).toDF("vid")
    val plain = GraphOps.pageRank(edges, verts, iters = 3)
      .orderBy("vid").collect().toSeq
    val ppr = GraphOps.personalizedPageRank(edges,
        verts.withColumn("seed", lit(true)), iters = 3)
      .orderBy("vid").collect().toSeq
    assert(plain == ppr)
  }

  test("personalizedPageRank: unreachable vertex ranks exactly 0") {
    import spark.implicits._
    // seed 1 feeds 2 feeds 3; vertex 4 only points INTO the chain
    // and nothing reaches it — rank exactly 0, no epsilon fog
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("vid")
      .withColumn("seed", col("vid") === 1L)
    val got = GraphOps.personalizedPageRank(edges, verts, iters = 4)
      .collect().map(r => r.getAs[Long]("vid") -> r.getAs[Long]("pr"))
      .toMap
    assert(got(4L) == 0L)
    // everything reachable from the seed is strictly positive, and
    // the seed never drops below its own teleport floor
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
    val tele = (1000000000000L * 15L / 100L) / 1L
    assert(got(1L) >= tele)
  }

  test("triangles: known graph counts and cc") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4 attached to 3 (directed input with
    // a duplicate and a reverse edge: symmetrization dedupes)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
      (1L, 2L)).toDF("src", "dst")
    val got = GraphOps.triangles(edges).collect()
      .map(r => r.getAs[Long]("vid") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Long]("cc_ppm")))).toMap
    // deg: 1->2, 2->2, 3->3, 4->1; one triangle credits 1,2,3
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 2000000L / 6L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("triangles: hub generates zero wedges (orientation bound)") {
    import spark.implicits._
    // star K_{1,50}: every edge orients leaf -> hub (deg 1 < deg 50),
    // so the hub's oriented out-degree is 0 and the wedge join
    // produces nothing — the Σ outdeg² hub-safety this operator buys
    val edges = (2L to 51L).map(l => (1L, l)).toDF("src", "dst")
    val got = GraphOps.triangles(edges)
    assert(got.filter(col("n_tri") =!= 0L).count() == 0L)
    val hub = got.filter(col("vid") === 1L).collect().head
    assert(hub.getAs[Long]("deg") == 50L)
    assert(hub.getAs[Long]("cc_ppm") == 0L)
  }

  test("labelPropagation: two cliques bridged converge to two communities") {
    import spark.implicits._
    // K4 on {1..4} + K4 on {11..14} + one bridge 4-11
    val k4a = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- 11L to 14L if a < b) yield (a, b)
    val edges = (k4a ++ k4b :+ (4L, 11L)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getAs[Long]("vid") ->
        (r.getAs[Long]("community"), r.getAs[Long]("csize"))).toMap
    // each clique collapses to its smallest label; the bridge does
    // not merge them (majority inside each clique wins)
    val cliqueA = Seq(1L, 2L, 3L, 4L).map(got(_)._1).distinct
    val cliqueB = Seq(11L, 12L, 13L, 14L).map(got(_)._1).distinct
    assert(cliqueA.length == 1 && cliqueB.length == 1)
    assert(cliqueA.head != cliqueB.head)
    assert(got(1L)._2 == 4L && got(11L)._2 == 4L)
  }

  test("labelPropagation: deterministic under repartitioning") {
    import spark.implicits._
    val edges = (0L until 60L).flatMap(v =>
      Seq((v, (v * 7 + 3) % 60), (v, (v + 1) % 60))).toDF("src", "dst")
    val a = GraphOps.labelPropagation(edges, rounds = 3)
      .orderBy("vid").collect().toSeq
    val b = GraphOps.labelPropagation(edges.repartition(7), rounds = 3)
      .orderBy("vid").collect().toSeq
    assert(a == b)
  }

  test("hopDistance: exact BFS hops within the round budget, -1 beyond") {
    import spark.implicits._
    // path 1-2-3-4-5-6, seed = 1; rounds = 3 reaches hop 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val verts = (1L to 6L).toDF("vid")
      .withColumn("seed", col("vid") === 1L)
    val got = GraphOps.hopDistance(edges, verts, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, 6L -> -1L))
  }

  test("graphBeamSearch: navigable ring graph reaches exact top-k") {
    import spark.implicits._
    // 1-D manifold: vec i = (cos θi, sin θi, 0...) with θ spaced so
    // cosine similarity decays with index distance — the exact kNN
    // graph is (i±1, i±2) and greedy search can WALK from entry 0 to
    // any query's neighborhood
    val n = 40
    val dim = 8
    def emb(i: Int): Array[Float] = {
      val th = 2.0 * math.Pi * i / n
      Array.tabulate(dim)(d =>
        if (d == 0) math.cos(th).toFloat
        else if (d == 1) math.sin(th).toFloat else 0f)
    }
    val embs = (0 until n).map(i => (i.toLong, emb(i)))
      .toDF("vec_id", "embedding")
    val edges = (0 until n).flatMap(i => Seq(1, 2, n - 1, n - 2).map(d =>
      (i.toLong, ((i + d) % n).toLong))).toDF("vec_id", "nbr_id")
    val got = SimilarityOps.graphBeamSearchFixedEntry(embs, edges,
        nQueries = 8, entryId = 0L, beam = 6, rounds = 6, k = 4,
        dim = dim)
      .select("query_id", "neighbor_id", "rnk")
      .orderBy("query_id", "rnk").collect().toSeq
    // navigability claim: after enough rounds the walk from entry 0
    // lands on the EXACT top-4 — same arithmetic and tie-break as
    // brute force, so compare against it directly
    val want = SimilarityOps.bruteForceTopK(embs, dim = dim,
        nQueries = 8, k = 4)
      .select("query_id", "neighbor_id", "rnk")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(got == want && got.size == 32)
  }

  test("communitySample: two-level top-k == direct top-k, k-bounded") {
    import spark.implicits._
    // one giant community (900 members) + two niche ones — the skew
    // case the two-level reduction exists for
    val labels = ((0L until 900L).map(v => (v, 1L)) ++
      (900L until 905L).map(v => (v, 2L)) ++
      Seq((905L, 3L))).toDF("vid", "community")
    val got = GraphOps.communitySample(labels, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bounded: ≤ k per community; the singleton community keeps its
    // one member
    val per = got.groupBy(_._2).map { case (c, xs) => c -> xs.length }
    assert(per == Map(1L -> 2, 2L -> 2, 3L -> 1))
    // equals the direct single-window top-k by (hash, vid)
    val h = graft.operators.SketchOps.u40(col("vid"))
    val direct = labels.select($"vid", $"community", h.as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap { case (c, xs) =>
        xs.sortBy(x => (x._3, x._1)).take(2).zipWithIndex
          .map { case (x, i) => (x._1, c, i + 1L) }
      }.toSet
    assert(got.toSet == direct)
    // deterministic under repartitioning
    val again = GraphOps.communitySample(labels.repartition(7), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("graphBeamSearch default is CELL-SEEDED: full recall on a " +
      "multi-component corpus where the fixed entry stalls") {
    import spark.implicits._
    // 4 disconnected "sheets": sheet s lives on axis pair
    // (2s, 2s+1) — cross-sheet cosine is exactly 0, so the kNN
    // graph splits into 4 components. Ids interleave sheets
    // (i % 4 = sheet), so queries 0..7 span ALL sheets while a
    // fixed entry 0 can only ever walk sheet 0.
    val n = 80
    val dim = 8
    def emb(i: Int): Array[Float] = {
      val s = i % 4
      val th = 2.0 * math.Pi * (i / 4) / (n / 4)
      Array.tabulate(dim)(d =>
        if (d == 2 * s) math.cos(th).toFloat
        else if (d == 2 * s + 1) math.sin(th).toFloat else 0f)
    }
    val embs = (0 until n).map(i => (i.toLong, emb(i)))
      .toDF("vec_id", "embedding")
    // intra-sheet ring edges (id steps of 4 and 8 = ring steps 1, 2)
    val edges = (0 until n).flatMap(i => Seq(4, 8, n - 4, n - 8)
      .map(d => (i.toLong, ((i + d) % n).toLong)))
      .toDF("vec_id", "nbr_id")
    val truth = SimilarityOps.bruteForceTopK(embs, dim = dim,
        nQueries = 8, k = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixed entry: only sheet-0 queries can succeed — the stall
    val fixed = SimilarityOps.graphBeamSearchFixedEntry(embs, edges,
        nQueries = 8, entryId = 0L, beam = 8, rounds = 8, k = 4,
        dim = dim)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixedRecall = (fixed & truth).size.toDouble / truth.size
    assert(fixedRecall <= 0.30, s"fixed-entry recall $fixedRecall " +
      "should stall at the component boundary")
    // the DEFAULT path (cell-seeded; centroids = vecs 0..7 cover all
    // sheets) starts each walk inside the query's own component
    val dflt = SimilarityOps.graphBeamSearch(embs, edges,
        nQueries = 8, beam = 8, rounds = 8, k = 4, dim = dim)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((dflt & truth).size == truth.size,
      s"default-path recall ${(dflt & truth).size}/${truth.size}")
  }

  test("graphBeamSearchFrom fails fast on entries that resolve to " +
      "no vector (no silent empty result)") {
    import spark.implicits._
    val embs = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(8)(d => if (d == 0) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val edges = (0 until 16).map(i => (i.toLong, ((i + 1) % 16).toLong))
      .toDF("vec_id", "nbr_id")
    // query id 99 is not a vector; the old gate silently returned
    // an empty frame
    val bad = Seq((99L, 0L)).toDF("query_id", "vec_id")
    intercept[IllegalArgumentException] {
      SimilarityOps.graphBeamSearchFrom(embs, edges, bad, dim = 8)
    }
    // entry vec_id 99 is not a vector either
    val bad2 = Seq((0L, 99L)).toDF("query_id", "vec_id")
    intercept[IllegalArgumentException] {
      SimilarityOps.graphBeamSearchFrom(embs, edges, bad2, dim = 8)
    }
  }

  test("graphBeamSearch: deterministic under repartitioning") {
    import spark.implicits._
    val embs = graft.sources.Tables.load(spark, sf("sf0.001"),
      "embeddings")
    val edges = SimilarityOps.knnGraph(embs)
      .select(col("vec_id"), col("nbr_id")).localCheckpoint()
    val a = SimilarityOps.graphBeamSearch(embs, edges)
      .orderBy("query_id", "rnk").collect().toSeq
    val b = SimilarityOps.graphBeamSearch(embs.repartition(7),
        edges.repartition(5))
      .orderBy("query_id", "rnk").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("triangles: K4 — every vertex in 3 triangles, cc = 1") {
    import spark.implicits._
    val vs = Seq(1L, 2L, 3L, 4L)
    val edges = (for (a <- vs; b <- vs if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = GraphOps.triangles(edges).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[Long]("deg") == 3L)
      assert(r.getAs[Long]("n_tri") == 3L)
      assert(r.getAs[Long]("cc_ppm") == 1000000L)
    }
  }
}
