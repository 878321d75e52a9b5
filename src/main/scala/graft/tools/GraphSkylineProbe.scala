package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, SimilarityOps, SkylineOps}
import graft.streaming.IncrementalSkyline
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Scale probe for the round-11 graph/skyline operators over the
  * Sf1Probe derived 10× corpus: the knee indicators are
  *  - emb37/emb39 PageRank: edges stay k·n (the mat-vec operand),
  *    wall ~linear in n;
  *  - emb38 triangles: WEDGE volume per vertex stays bounded (the
  *    degree-orientation hub-safety claim);
  *  - doc43 skyline: |prune survivors| — the operand of the only
  *    non-equi join — grows sublinearly vs the corpus;
  *  - cdc37 incremental skyline: marginal-batch wall flat at 10×
  *    corpus (state = frontier, never corpus).
  *
  * Usage: sbt "runMain graft.tools.GraphSkylineProbe [sfDir] [sf1Dir]"
  */
object GraphSkylineProbe {
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
    probeAll(spark, sfDir, useTables = true)
    println(s"== sf1 ($outDir) ==")
    probeAll(spark, outDir, useTables = false)
    spark.stop()
  }

  private def probeAll(spark: SparkSession, dir: String,
      useTables: Boolean): Unit = {
    val docs =
      if (useTables) graft.sources.Tables.load(spark, dir, "documents")
      else spark.read.parquet(s"$dir/documents.parquet")
    val embs =
      if (useTables) graft.sources.Tables.load(spark, dir, "embeddings")
      else spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count()
    // corpus-proportional nlist (the emb29 probe finding: fixed-k
    // cells at 10x corpus means 10x cell size; real deployments grow
    // nlist with n)
    val nCents = math.max(8, math.sqrt(n.toDouble).toInt / 2)

    // emb37: PageRank over the kNN graph
    {
      val t0 = System.nanoTime()
      val edges = SimilarityOps.knnGraph(embs, nCentroids = nCents)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        .localCheckpoint()
      val nEdges = edges.count()
      val tGraph = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val prSum = GraphOps.pageRank(edges,
          embs.select(col("vec_id").as("vid")), iters = 3)
        .agg(sum("pr")).collect()(0).getLong(0)
      val tPr = (System.nanoTime() - t1) / 1e9
      CheckpointBridge.freeLocalCheckpoint(edges)
      println(f"PROBE emb37_pagerank   $n%8d vecs  edges: $nEdges%8d " +
        f"(${nEdges.toDouble / n}%.2f/vec)  graph: $tGraph%6.1f s  " +
        f"3-iter pr: $tPr%6.1f s  mass: $prSum%d")
    }

    // emb38: triangle counting — wedge volume is the claim
    {
      val edges = SimilarityOps.knnGraph(embs, nCentroids = nCents)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val tri = GraphOps.triangles(edges).localCheckpoint()
      val nTri = tri.agg(sum("n_tri")).collect()(0).getLong(0) / 3
      val tTri = (System.nanoTime() - t0) / 1e9
      // wedge volume replayed from the same orientation the operator
      // uses: sum over apexes of C(outdeg, 2)
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
      val deg = und.select(col("u").as("vid"))
        .unionByName(und.select(col("v").as("vid")))
        .groupBy("vid").agg(count(lit(1)).as("deg"))
      val ou = und.join(deg.select(col("vid").as("u"),
          col("deg").as("du")), Seq("u"))
        .join(deg.select(col("vid").as("v"), col("deg").as("dv")),
          Seq("v"))
        .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"))
      val wedges = ou.groupBy("a").agg(count(lit(1)).as("o"))
        .agg(sum(expr("o * (o - 1) div 2"))).collect()(0).getLong(0)
      CheckpointBridge.freeLocalCheckpoint(edges)
      CheckpointBridge.freeLocalCheckpoint(tri)
      println(f"PROBE emb38_triangles  $n%8d vecs  wedges: $wedges%9d " +
        f"(${wedges.toDouble / n}%.2f/vec)  triangles: $nTri%8d  " +
        f"wall: $tTri%6.1f s")
    }

    // emb40/emb41: LPA communities + BFS — per-round join volume is
    // the edge list; community count tracks graph structure
    {
      val edges = SimilarityOps.knnGraph(embs, nCentroids = nCents)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val comm = GraphOps.labelPropagation(edges, rounds = 3)
      val nComm = comm.select("community").distinct().count()
      val tLpa = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val reach = GraphOps.hopDistance(edges,
          embs.select(col("vec_id").as("vid"),
            (col("vec_id") % 10 === 0).as("seed")), rounds = 3)
        .filter(col("dist") >= 0).count()
      val tBfs = (System.nanoTime() - t1) / 1e9
      CheckpointBridge.freeLocalCheckpoint(edges)
      println(f"PROBE emb40_41_graph   $n%8d vecs  communities: " +
        f"$nComm%6d ($tLpa%5.1f s)  reached<=3hops: $reach%8d " +
        f"(${100.0 * reach / n}%.1f%%, $tBfs%5.1f s)")
    }

    // emb42: graph beam search — recall vs brute force as rounds
    // grow (the navigability trade: walk length buys recall; cost is
    // rounds·beam·degree lookups, corpus-size-free)
    {
      val edges = SimilarityOps.knnGraph(embs, nCentroids = nCents)
        .select(col("vec_id"), col("nbr_id"))
        .localCheckpoint()
      val truth = SimilarityOps.bruteForceTopK(embs, nQueries = 8,
          k = 4)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recalls = Seq(2, 4, 8).map { r =>
        val got = SimilarityOps.graphBeamSearchFixedEntry(embs,
            edges, rounds = r, beam = 8, k = 4)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
        f"r$r=${100.0 * (got & truth).size / truth.size}%.0f%%"
      }.mkString(" ")
      // cell-seeded entries: the IVF→graph hybrid — the walk starts
      // inside the query's own component, the fix for multi-sheet
      // corpora where a single fixed entry cannot cross components
      val ranked = SimilarityOps.rankedCellAssignments(embs,
        nCentroids = nCents)
      val cellRep = ranked.filter(col("rn") === 1)
        .groupBy("cid").agg(min("vec_id").as("entry"))
      val entries = ranked
        .filter(col("vec_id") < 8 && col("rn") <= 2)
        .join(cellRep, Seq("cid"))
        .select(col("vec_id").as("query_id"),
          col("entry").as("vec_id"))
      val gotSeeded = SimilarityOps.graphBeamSearchFrom(embs, edges,
          entries, rounds = 8, beam = 8, k = 4)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
      val seeded =
        f"${100.0 * (gotSeeded & truth).size / truth.size}%.0f%%"
      CheckpointBridge.freeLocalCheckpoint(edges)
      println(f"PROBE emb42_beam       $n%8d vecs  recall@4 vs brute: " +
        f"$recalls  cell-seeded r8: $seeded")
    }

    // doc43: skyline — survivor shell vs corpus
    {
      val nDocs = docs.count()
      val m = docs
        .select(col("doc_id"), col("n_chars"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "n_chars")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("word")).as("n_types"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val surv = SkylineOps.pruneSurvivors(m, "doc_id",
        Seq("n_tokens", "n_types"), Seq("n_chars")).count()
      val sh = SkylineOps.shell(m, "doc_id",
        Seq("n_tokens", "n_types"), Seq("n_chars")).count()
      val front = SkylineOps.skyline(m, "doc_id",
        Seq("n_tokens", "n_types"), Seq("n_chars")).count()
      val tSky = (System.nanoTime() - t0) / 1e9
      CheckpointBridge.freeLocalCheckpoint(m)
      SkylineOps.unpersistShellCaches(blocking = true)
      println(f"PROBE doc43_skyline    $nDocs%8d docs  corner-prune: " +
        f"$surv%7d (${100.0 * surv / nDocs}%.1f%%)  shell: $sh%6d  " +
        f"frontier: $front%6d  wall: $tSky%6.1f s")
    }

    // cdc37: marginal batch against a 9/10-full frontier state
    {
      val table = "gsprobe_frontier"
      Seq(table, s"${table}_stage", s"${table}_old")
        .foreach(graft.streaming.CdcMerge.dropStateTable(spark, _))
      val m = docs
        .select(col("doc_id"), col("n_chars"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "n_chars")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("word")).as("n_types"))
        .localCheckpoint()
      def part(i: Int) = m.filter(pmod(col("doc_id"), lit(10)) === i)
      val t0 = System.nanoTime()
      (0 until 9).foreach(i => IncrementalSkyline.applyBatch(spark,
        table, part(i), "doc_id", Seq("n_tokens", "n_types"),
        Seq("n_chars")))
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      IncrementalSkyline.applyBatch(spark, table, part(9), "doc_id",
        Seq("n_tokens", "n_types"), Seq("n_chars"))
      val tMarg = (System.nanoTime() - t1) / 1e9
      val stateRows = spark.table(table).count()
      CheckpointBridge.freeLocalCheckpoint(m)
      println(f"PROBE cdc37_inc_sky    9-batch build: $tBuild%6.1f s  " +
        f"marginal batch: $tMarg%6.1f s  frontier state: $stateRows%6d")
    }
  }
}
