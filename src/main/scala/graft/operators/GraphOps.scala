package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs (the emb29 kNN graph,
  * the doc17 duplicate graph): PageRank centrality for
  * REPRESENTATIVENESS-aware selection — pick the documents/vectors
  * the rest of the corpus points at, the graph-native complement of
  * the doc30 DSIR importance weights — and triangle counting /
  * clustering coefficients, the local-density audit that separates
  * "this vector sits in a tight near-dup clump" from "this vector
  * bridges unrelated regions" (reference has no graph surface; these
  * are the standard corpus-graph curation primitives).
  *
  * Determinism doctrine (the doc23 float-free rule for every
  * aggregated value): PageRank mass is BIGINT fixed-point at
  * `scale` parts (default 10¹²); per-edge contributions are
  * TRUNCATING integer divisions, so partial-aggregated BIGINT sums
  * associate — partition order cannot flip a digit, and DuckDB
  * replays the identical arithmetic. Truncation leaks ≤ outdeg-1
  * parts per vertex per round — a bias of ~10⁻¹² of total mass,
  * bought for cross-engine bit-equality.
  *
  * Scale shape: one iteration of PageRank = one equi-join
  * (edges ⋈ rank on src; edges pre-carry outdeg) + one map-side-
  * combined sum by dst — the classic sparse mat-vec. The corpus-
  * sized edge side is hash-repartitioned on its join key ONCE and
  * persisted, so iterations never reshuffle it (only the n-row rank
  * vector moves per round), and every round's state is
  * localCheckpoint-ed with immediate free of the superseded round
  * (the nnDescent / balancedAssignStrict discipline) — plan depth,
  * Catalyst analysis time and lineage stay O(1) in `iters` instead
  * of unrolling, which is what a real 20–50-round PageRank/LPA run
  * needs. Triangle counting uses the degree-ordered
  * orientation (each undirected edge directed toward the higher
  * (deg, id) endpoint), which bounds every vertex's oriented
  * out-degree by O(√m) — wedge volume Σ outdeg² stays
  * O(m^{3/2}) on ANY degree distribution (the power-law corpus
  * case), where the naive all-wedges count explodes on hubs. All
  * joins are equi-joins on vertex ids.
  */
object GraphOps {

  /** PageRank with `iters` iterations over a directed edge list, in
    * exact BIGINT fixed-point.
    *
    * @param edges    (src, dst) BIGINT pairs; parallel edges count
    *                 once each (dedupe upstream if unwanted).
    * @param vertices one (vid) row per vertex. Vertices with no
    *                 out-edge are DANGLING: by default their mass
    *                 leaks (exact for the kNN graph, which has none —
    *                 every vector emits k edges); pass
    *                 `redistributeDangling = true` for general edge
    *                 lists (e.g. the doc17 dup graph after
    *                 filtering), where each round the dangling
    *                 vertices' damped mass is redistributed over the
    *                 teleport distribution — the standard convention
    *                 (dangling mass follows teleport), conserving
    *                 total mass to the truncation bound.
    * @param dampPct  damping in percent (classic 85).
    * @param scale    fixed-point denominator: rank is "parts of
    *                 `scale`", initialized at scale div n.
    * @return (vid, deg_out, pr) — pr after `iters` rounds.
    */
  def pageRank(edges: DataFrame, vertices: DataFrame, iters: Int = 3,
      dampPct: Long = 85L, scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false): DataFrame =
    rankLoop(edges, vertices.select(col("vid"), lit(true).as("seed")),
      iters, dampPct, scale, redistributeDangling)

  /** PageRank iterated to the exact integer FIXED POINT — stop when
    * a round reproduces the previous rank vector bit-for-bit (integer
    * arithmetic makes "converged" a decidable equality, not an
    * epsilon). The warm-start lever for MAINTAINED graphs
    * ([[graft.streaming.IncrementalPageRank]]): seeding `init` with
    * the previous graph version's committed ranks reaches the
    * attractor in fewer rounds than the cold uniform prior, and lands
    * on the IDENTICAL vector — see [[fixedPointLoop]] for why that
    * equality needs sub-precision contributions (truncation noise at
    * the classic precision leaves a BAND of fixed points, measured)
    * and for the measured failure modes behind each design choice.
    * Vertices absent from `init` (new arrivals) start at the cold
    * prior. Returns (ranks (vid, deg_out, pr), rounds used); throws
    * past `maxIters`. Note the fixed-point arithmetic is
    * sub-precision and NOT comparable to [[pageRank]]'s 3-round
    * classic-precision values — the two surfaces answer different
    * questions (a fixed refresh budget vs a converged attractor). */
  def pageRankFixedPoint(edges: DataFrame, vertices: DataFrame,
      init: Option[DataFrame] = None, maxIters: Int = 500,
      dampPct: Long = 85L, scale: Long = 1000000000000L)
      : (DataFrame, Int) =
    fixedPointLoop(edges, vertices, init, maxIters, dampPct, scale)

  /** PERSONALIZED PageRank (TrustRank): identical dynamics but the
    * teleport mass lands only on the SEED vertices (`vertices` must
    * carry a boolean `seed` column) — rank becomes "how reachable is
    * this vertex from the trusted seeds", the corpus-trust /
    * topic-affinity propagation primitive: seed a small vetted set,
    * keep what the graph pulls close to it. Non-seeds can still rank
    * high (mass flows to them through edges); an unreachable vertex
    * ranks exactly 0 — integer arithmetic, no epsilon fog. With
    * `redistributeDangling`, sink mass returns to the seeds (the
    * teleport distribution), as in classic TrustRank. */
  def personalizedPageRank(edges: DataFrame, vertices: DataFrame,
      iters: Int = 3, dampPct: Long = 85L,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false): DataFrame =
    rankLoop(edges, vertices, iters, dampPct, scale,
      redistributeDangling)

  /** The fixed-budget damped power iteration behind [[pageRank]] /
    * [[personalizedPageRank]] — classic-precision arithmetic, oracle-
    * replayed, untouched by the fixed-point surface. */
  private def rankLoop(edges: DataFrame, vertices: DataFrame,
      iters: Int, dampPct: Long, scale: Long,
      redistributeDangling: Boolean): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    import org.apache.spark.storage.StorageLevel
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    // seed count: a 1-value control-plane read — also the fail-fast
    // guard (an empty seed set would null every div-n expression and
    // silently return all-null ranks)
    val n = vertices.agg(
        coalesce(sum(when(col("seed"), 1L).otherwise(0L)), lit(0L)))
      .head().getLong(0)
    require(n >= 1, "pageRank needs at least one (seed) vertex — " +
      "an empty seed set has no teleport distribution")
    val verts = vertices.select(col("vid"), col("seed"))
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg_out"))
    // teleport term: ((scale·(100−damp)) div 100) div n_seeds on the
    // seeds, 0 elsewhere — fixed per vertex across rounds
    val base = verts.select(col("vid"), col("seed"),
      when(col("seed"),
        lit(((scale * (100 - dampPct)) / 100) / n))
        .otherwise(lit(0L)).as("tele"))
    // corpus-sized side: edges ⋈ outdeg, repartitioned on the join
    // key ONCE and persisted — rounds reshuffle only the n-row rank
    val ed = edges.join(outdeg, Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dangling vertices (no out-edge): vertex-keyed, fixed per run
    val dang =
      if (redistributeDangling)
        verts.select(col("vid"))
          .join(outdeg.select(col("src").as("vid")), Seq("vid"),
            "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
      else null
    var ck = verts.select(col("vid"),
      when(col("seed"), lit(scale / n)).otherwise(lit(0L)).as("pr"))
      .localCheckpoint()
    var pr = ck
    try {
      for (_ <- 1 to iters) {
        val contrib = ed
          .join(pr.select(col("vid").as("src"), col("pr")), Seq("src"))
          .select(col("dst").as("vid"),
            expr("pr div deg_out").as("c"))
          .groupBy("vid").agg(sum(col("c")).as("s"))
        val stepped = base.join(contrib, Seq("vid"), "left_outer")
        val next =
          (if (redistributeDangling) {
             // damped sink mass back onto the teleport distribution:
             // share = ((damp·D) div 100) div n per seed — a 1-row
             // broadcast per round, re-checkpointed away immediately
             val d1 = pr.join(dang, Seq("vid"), "left_semi")
               .agg(coalesce(sum(col("pr")), lit(0L)).as("d"))
             stepped.crossJoin(broadcast(d1))
               .select(col("vid"),
                 (col("tele") +
                   expr(s"(${dampPct}L * coalesce(s, 0L)) div 100L") +
                   when(col("seed"),
                     expr(s"((${dampPct}L * d) div 100L) div ${n}L"))
                     .otherwise(lit(0L))).as("pr"))
           } else
             stepped.select(col("vid"),
               (col("tele") +
                 expr(s"(${dampPct}L * coalesce(s, 0L)) div 100L"))
                 .as("pr")))
            .localCheckpoint()
        CheckpointBridge.freeLocalCheckpoint(ck)
        ck = next
        pr = next
      }
      // final deg_out from the CACHED edge side (deg_out is
      // functionally dependent on src), materialized BEFORE the
      // finally unpersists it — the lazy form would recompute the
      // whole edge pipeline (for the kNN graph: the full ANN build)
      // once more at first consumption
      val result = pr.join(
          ed.select(col("src").as("vid"), col("deg_out"))
            .dropDuplicates("vid"),
          Seq("vid"), "left_outer")
        .select(col("vid"), coalesce(col("deg_out"), lit(0L))
          .as("deg_out"), col("pr"))
        .localCheckpoint()
      CheckpointBridge.freeLocalCheckpoint(ck) // superseded by result
      result
    } finally {
      ed.unpersist()
      if (dang != null) dang.unpersist()
      ()
    }
  }

  /** The fixed-point iteration behind [[pageRankFixedPoint]]:
    * Tarski's DESCENDING iteration `x ← min(x, F(x))` to the GREATEST
    * fixed point of the (sub-precision) truncated update map. Each
    * design choice was bought by a measured failure:
    *
    *  - WHY A DESCENT, not plain iteration: integer truncation gives
    *    the update map multiple adjacent fixed points and limit
    *    cycles, and a plain orbit lands on an ORBIT-DEPENDENT one —
    *    a warm and a cold run of the same graph settled one unit
    *    apart on dozens of vertices (measured, twice: at classic and
    *    at sub-precision, where ~10 vertices also oscillated with
    *    amplitude 1 forever). The descent is orbit-independent: F is
    *    monotone, so from any start `x₀ ≥ gfp` the invariant
    *    `xₖ ≥ gfp` holds, the integer sequence is non-increasing and
    *    terminates at a pre-fixed point `z ≤ F(z)`, which
    *    Knaster-Tarski (`gfp = sup{x : x ≤ F(x)}`) pins to exactly
    *    `z = gfp` — warm and cold land on the IDENTICAL vector.
    *  - The provable cold start is `scale·1`: every fixed point's
    *    total mass is ≤ Σtele/(1−damp) ≤ scale (floors only lose
    *    mass), so gfp < scale pointwise. A warm hint must also be
    *    ≥ gfp pointwise; a violated hint is DETECTED (termination at
    *    a non-fixed pre-fixed point — impossible from a sound start)
    *    and restarted once from the provable bound, so exactness
    *    never depends on the hint, only the round count does.
    *  - SUB-PRECISION contributions (`(pr·2¹⁶) div deg`, the 2¹⁶
    *    folded out inside the damp division): at classic precision
    *    the descent's tail CRAWLED unit-by-unit through per-edge
    *    floor noise (measured 160+ rounds of grind); with the noise
    *    under one unit the tail contracts geometrically. Overflow
    *    headroom: Σx ≤ n·scale at the start bound — the contribution
    *    sum is ≤ 2¹⁶·(Σx)/k … capped by the require below.
    *  - Fresh-stats checkpoints ([[CheckpointBridge
    *    .localCheckpointFreshStats]]): localCheckpoint carries plan
    *    statistics forward, and a loop joining two checkpointed
    *    frames per round MULTIPLIES the sizeInBytes BigInts — bit
    *    length doubles per round until the optimizer burns minutes
    *    inside BigInteger multiplication (measured round walls
    *    1 s → 433 s; thread-dump-confirmed). The corpus-sized edge
    *    frame is checkpointed too — an uncut lineage ships the whole
    *    upstream plan in every task binary (measured 2.1 MiB/task).
    *
    * No dangling handling — the kNN-graph family this serves has
    * none (every vector emits k edges); general sink graphs use
    * [[pageRank]]'s fixed budget. */
  private def fixedPointLoop(edges: DataFrame, vertices: DataFrame,
      init: Option[DataFrame], maxIters: Int, dampPct: Long,
      scale: Long): (DataFrame, Int) = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    require(maxIters >= 1 && dampPct >= 0 && dampPct <= 100)
    val SUB = 65536L
    def ckpt(df: DataFrame): DataFrame =
      CheckpointBridge.localCheckpointFreshStats(df)
    val n = vertices.count()
    require(n >= 1, "pageRankFixedPoint needs at least one vertex")
    // descent states are bounded by the start value scale·1, so the
    // per-vertex contribution sum is ≤ 2¹⁶·scale·maxInDeg/k; the
    // conservative global bound keeps Long arithmetic safe
    require(scale <= 1000000000000L,
      "fixedPointLoop: scale above 10¹² risks overflowing the " +
        "sub-precision contribution sums")
    val verts = vertices.select(col("vid"))
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg_out"))
    val tele = ((scale * (100 - dampPct)) / 100) / n
    val ed = ckpt(edges.join(outdeg, Seq("src"))
      .repartition(col("src")))
    val upperStart = verts.select(col("vid"), lit(scale).as("pr"))
    var ck = ckpt(init match {
      case Some(prev) =>
        // warm hint capped at the provable bound; vertices absent
        // from it (new arrivals) start at the bound
        verts.join(
            prev.select(col("vid"), col("pr").as("_init_pr")),
            Seq("vid"), "left_outer")
          .select(col("vid"),
            least(lit(scale), coalesce(col("_init_pr"), lit(scale)))
              .as("pr"))
      case None => upperStart
    })
    var pr = ck
    var rounds = 0
    var converged = false
    var restarted = init.isEmpty
    try {
      var i = 0
      while (i < maxIters && !converged) {
        i += 1
        rounds = i
        // per-edge term stays in Long (pr ≤ scale at the start bound,
        // so pr·2¹⁶ ≤ 6.6·10¹⁶); the PER-VERTEX sum accumulates in
        // DECIMAL(38,0) — hub in-degrees × the start bound overflow
        // Long (measured ARITHMETIC_OVERFLOW at 85·Σ), and
        // integer-valued decimal sums stay order-independent exact
        val contrib = ed
          .join(pr.select(col("vid").as("src"), col("pr")), Seq("src"))
          .select(col("dst").as("vid"),
            expr(s"(pr * ${SUB}L) div deg_out")
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              .as("c"))
          .groupBy("vid").agg(sum(col("c")).as("s"))
        val fx = ckpt(verts
          .join(contrib, Seq("vid"), "left_outer")
          .select(col("vid"),
            (lit(tele) +
              expr(s"CAST((${dampPct} * coalesce(s, CAST(0 AS " +
                s"DECIMAL(38,0)))) div ${100L * SUB}L AS BIGINT)"))
              .as("pr")))
        // one pass: is F(x) anywhere BELOW x (still descending)? is
        // it anywhere DIFFERENT (fixed-point check)?
        val joined = ckpt(pr.select(col("vid"), col("pr").as("_x"))
          .join(fx.select(col("vid"), col("pr").as("_fx")),
            Seq("vid")))
        val cmp = joined.agg(
          coalesce(sum(when(col("_fx") < col("_x"), 1L)
            .otherwise(0L)), lit(0L)),
          coalesce(sum(when(col("_fx") =!= col("_x"), 1L)
            .otherwise(0L)), lit(0L))).collect()(0)
        val (below, diff) = (cmp.getLong(0), cmp.getLong(1))
        if (below > 0L) {
          // still descending: step to min(x, F(x))
          val stepped = ckpt(joined.select(col("vid"),
            least(col("_x"), col("_fx")).as("pr")))
          CheckpointBridge.freeLocalCheckpoint(ck)
          CheckpointBridge.freeLocalCheckpoint(fx)
          ck = stepped
          pr = stepped
        } else if (diff == 0L) {
          // terminated at a FIXED point: x ≥ gfp (invariant) and
          // x pre-fixed ⇒ x ≤ gfp (Tarski) ⇒ x = gfp exactly
          converged = true
          CheckpointBridge.freeLocalCheckpoint(ck)
          ck = fx
          pr = fx
        } else if (!restarted) {
          // terminated pre-fixed but NOT fixed — impossible from a
          // start ≥ gfp, so the warm hint violated the bound (a
          // vertex outgrew its headroom): restart from the provable
          // bound; exactness never depends on the hint
          restarted = true
          val fresh = ckpt(upperStart)
          CheckpointBridge.freeLocalCheckpoint(ck)
          CheckpointBridge.freeLocalCheckpoint(fx)
          ck = fresh
          pr = fresh
        } else {
          CheckpointBridge.freeLocalCheckpoint(ck)
          CheckpointBridge.freeLocalCheckpoint(fx)
          throw new IllegalStateException(
            "pageRankFixedPoint: descent from the provable upper " +
              "bound terminated at a non-fixed pre-fixed point — " +
              "cannot happen for a monotone update; investigate")
        }
        CheckpointBridge.freeLocalCheckpoint(joined)
      }
      if (!converged) {
        CheckpointBridge.freeLocalCheckpoint(ck)
        throw new IllegalStateException(
          s"pageRankFixedPoint: descent not terminated within " +
            s"$maxIters rounds — raise maxIters (or use pageRank's " +
            "fixed budget)")
      }
      val result = pr.join(
          ed.select(col("src").as("vid"), col("deg_out"))
            .dropDuplicates("vid"),
          Seq("vid"), "left_outer")
        .select(col("vid"), coalesce(col("deg_out"), lit(0L))
          .as("deg_out"), col("pr"))
        .localCheckpoint()
      CheckpointBridge.freeLocalCheckpoint(ck)
      (result, rounds)
    } finally {
      CheckpointBridge.freeLocalCheckpoint(ed)
      ()
    }
  }

  /** Synchronous LABEL PROPAGATION (LPA) community detection over
    * the UNDIRECTED closure of the edge list — community structure
    * for corpus analysis: near-dup cliques, topical clusters, and
    * the diversity-balancing unit ("sample per community, not per
    * document"). Every vertex starts as its own label; each round it
    * adopts the MAJORITY label among its neighbors, ties broken by
    * smallest label — fully deterministic (the async/random-order
    * variants converge faster but are irreproducible; a data
    * pipeline wants replayable communities). `rounds` is fixed and
    * unrolled: one edges⋈labels equi-join + one (vid, label) count
    * + one per-vid argmax window (groups bounded by degree) per
    * round. Returns (vid, community, csize). */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    import org.apache.spark.storage.StorageLevel
    require(rounds >= 1)
    val und = undirected(edges)
    // corpus-sized side: repartitioned on the per-round join key
    // once and persisted — rounds reshuffle only the label vector
    val adj = und.unionByName(
      und.select(col("u").as("v"), col("v").as("u")))
      .select(col("u").as("vid"), col("v").as("nbr"))
      .repartition(col("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ck = adj.select(col("vid")).distinct()
      .select(col("vid"), col("vid").as("label"))
      .localCheckpoint()
    var labels = ck
    val w = Window.partitionBy(col("vid"))
      .orderBy(col("votes").desc, col("label"))
    try {
      for (_ <- 1 to rounds) {
        val next = adj
          .join(labels.select(col("vid").as("nbr"), col("label")),
            Seq("nbr"))
          .groupBy("vid", "label").agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vid"), col("label"))
          .localCheckpoint()
        CheckpointBridge.freeLocalCheckpoint(ck)
        ck = next
        labels = next
      }
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("csize"))
      labels.join(sizes, Seq("label"))
        .select(col("vid"), col("label").as("community"), col("csize"))
    } finally {
      adj.unpersist()
      ()
    }
  }

  /** Multi-source BFS HOP DISTANCE from a seed set through the
    * undirected closure — "how many nearest-neighbor hops from the
    * trusted corpus is this document": the exact-hop complement of
    * [[personalizedPageRank]]'s mass view. `vertices` carries a
    * boolean `seed` column. Fixed `rounds` of min-propagation
    * (dist(v) = min(dist(v), min over nbrs + 1) — min is idempotent
    * and order-free, so the result is exact BFS up to `rounds` hops);
    * vertices unreached within `rounds` report dist = −1. One
    * equi-join + one min-aggregate per round. Returns (vid, dist). */
  def hopDistance(edges: DataFrame, vertices: DataFrame,
      rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    import org.apache.spark.storage.StorageLevel
    require(rounds >= 1)
    val und = undirected(edges)
    val adj = und.unionByName(
      und.select(col("u").as("v"), col("v").as("u")))
      .select(col("u").as("vid"), col("v").as("nbr"))
      .repartition(col("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ck = vertices.select(col("vid"),
      when(col("seed"), lit(0L)).as("dist"))
      .localCheckpoint()
    var dist = ck
    try {
      for (_ <- 1 to rounds) {
        val viaNbr = adj
          .join(dist.select(col("vid").as("nbr"), col("dist")),
            Seq("nbr"))
          .filter(col("dist").isNotNull)
          .groupBy("vid").agg(min(col("dist") + 1L).as("nd"))
        val next = dist.join(viaNbr, Seq("vid"), "left_outer")
          .select(col("vid"), least(col("dist"), col("nd")).as("dist"))
          .localCheckpoint()
        CheckpointBridge.freeLocalCheckpoint(ck)
        ck = next
        dist = next
      }
      dist.select(col("vid"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
    } finally {
      adj.unpersist()
      ()
    }
  }

  /** COMMUNITY-BALANCED SAMPLING — `k` deterministic representatives
    * per community from a (vid, community) labeling (e.g.
    * [[labelPropagation]]): the diversity knob of a curation
    * pipeline ("sample per community, not per document" — a corpus
    * that is 90% one clump contributes k docs from it, same as every
    * niche clump). Selection ranks by the content-independent doc08
    * hash (stable under reprocessing, no RNG), ties by vid.
    *
    * Skew-proof shape: a giant community would make a single
    * community-partitioned window a one-task straggler, so the top-k
    * runs TWO-LEVEL — per (community, salt) top-k over 16 hash
    * salts (groups bounded at |community|/16), then a merge window
    * over ≤ 16·k rows per community. Lossless: the global top-k by
    * (h, vid) is contained in the per-salt top-k's. Returns
    * (vid, community, rnk). */
  def communitySample(labels: DataFrame, k: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val h = graft.operators.SketchOps.u40(col("vid"))
    val salted = labels.select(col("vid"), col("community"),
      h.as("h"), pmod(h, lit(16L)).as("salt"))
    val w1 = Window.partitionBy(col("community"), col("salt"))
      .orderBy(col("h"), col("vid"))
    val w2 = Window.partitionBy(col("community"))
      .orderBy(col("h"), col("vid"))
    salted
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("vid"), col("community"), col("rnk"))
  }

  private def undirected(edges: DataFrame): DataFrame =
    edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()

  /** Per-vertex triangle count + clustering coefficient over the
    * UNDIRECTED closure of a directed edge list (edges symmetrized,
    * self-loops dropped, each unordered pair kept once).
    *
    * Orientation: every undirected edge {u,v} is directed toward the
    * endpoint with the larger (degree, id) key; a triangle {a,b,c}
    * is counted exactly once as the wedge (a→b, a→c) with ord(b) <
    * ord(c) closed by the oriented edge (b→c). Join work: wedge
    * generation is a self-equi-join on the wedge apex, Σ outdeg²
    * with outdeg ≤ O(√m) by the orientation; the closing probe is an
    * equi-join on (b,c).
    *
    * Clustering coefficient in truncating ppm:
    * cc = (2·10⁶·tri) div (deg·(deg−1)) for deg ≥ 2, else 0.
    * Output has one row per vertex WITH at least one edge (isolated
    * vertices have no triangles and no coefficient to report).
    * Returns (vid, deg, n_tri, cc_ppm). */
  def triangles(edges: DataFrame): DataFrame = {
    // undirected edge set: {u,v} once, u < v
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    // undirected degree
    val deg = und.select(col("u").as("vid"))
      .unionByName(und.select(col("v").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("deg"))
    // total order key ord = (deg, vid); orient low → high
    val du = deg.select(col("vid").as("u"), col("deg").as("du"))
    val dv = deg.select(col("vid").as("v"), col("deg").as("dv"))
    val oriented = und.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
    // wedge (a→b, a→c), ord(b) < ord(c): both endpoints carry their
    // (deg, id) key so the wedge dedup needs no extra join
    val ob = oriented.join(
      deg.select(col("vid").as("b"), col("deg").as("db")), Seq("b"))
    val w1 = ob.select(col("a"), col("b"), col("db"))
    val w2 = ob.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val wedges = w1.join(w2, Seq("a"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("a"), col("b"), col("c"))
    // close the wedge: oriented edge (b→c) must exist
    val closing = oriented.select(col("a").as("b"), col("b").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
    // each triangle credits all three corners
    val perVertex = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("vid"))
      .groupBy("vid").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("vid"), "left_outer")
      .select(col("vid"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_ppm",
        when(col("deg") >= 2,
          expr("(2000000L * n_tri) div (deg * (deg - 1L))"))
          .otherwise(lit(0L)))
  }
}
