package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pareto-frontier (SKYLINE) selection — multi-objective curation:
  * the documents no other document beats on EVERY axis at once
  * (e.g. most tokens, most distinct types, fewest bytes). The
  * frontier is what a curation pipeline keeps when objectives
  * conflict and scalarizing them (a weighted score) would bake in an
  * arbitrary trade-off; the skyline is exactly the set of documents
  * that are optimal under SOME monotone preference.
  *
  * Distributed shape (the classic two-phase grid skyline): the naive
  * answer is an n² dominance self-join — impossible at corpus scale.
  * Phase 1 buckets every point into a g^d grid (per-dim equi-width
  * over the corpus extremes, one 1-row broadcast) and aggregates
  * per-cell corner summaries (≤ g^d rows, control-plane sized); a
  * cell whose BEST corner is strictly dominated by an occupied
  * cell's WORST corner is discarded wholesale — LOSSLESS: every
  * point in it is dominated by every point of the dominating cell,
  * and dominance chains always end at a frontier point, so no
  * frontier point is ever inside a pruned cell. Phase 2 anti-joins
  * every survivor against one REPRESENTATIVE per occupied cell
  * (≤ g^d rows, broadcast) — any subset is a sound dominance
  * filter, and the per-cell reps blanket the frontier band that
  * corner pruning cannot touch on anti-correlated metrics (measured
  * on the token/type/byte corpus: corner prune alone left 97.6%
  * standing; with reps the shell hugs the frontier). Phase 3 runs
  * the exact pairwise test on that shell only. Cost honesty: the
  * final stage is |shell|²; a perfectly anti-correlated corpus has
  * a large frontier and no algorithm avoids producing it. Raise `g`
  * to tighten both filters.
  *
  * Dominance is on INTEGER metrics (the doc23 doctrine) — b
  * dominates a iff b is ≥ on every maximize-dim, ≤ on every
  * minimize-dim, and strictly better on at least one. Ties (equal
  * on every dim) dominate in neither direction: both stay.
  *
  * RANGE PRECONDITION (the histSketch-style overflow contract): the
  * bucket and champion-score expressions multiply a per-dim offset
  * (value − min) by up to 4g·10⁶ in BIGINT, so each dim's range
  * (max − min) must satisfy range · 4g · 10⁶ < 2⁶³ — i.e. range
  * below ~2.8·10¹¹ at the default g=8. Token/type/byte curation
  * metrics sit many orders below that; a caller with astronomical
  * metric ranges must rescale (divide) them first, exactly as
  * histSketch requires (hi − lo)·w < 2⁶³ of its domain.
  */
object SkylineOps {

  /** Shell frames persisted by [[skyline]] for the size gate +
    * intra-plan reuse (the [[DedupOps]] shingle-cache lifecycle:
    * caller-visible drain after the consuming action; Verify/Bench
    * drain per query). Safe any time — persisted frames recompute
    * transparently. */
  private val liveCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every shell cache registered since the last drain. */
  def unpersistShellCaches(blocking: Boolean = false): Int = {
    var n = 0
    var df = liveCaches.poll()
    while (df != null) {
      df.unpersist(blocking); n += 1; df = liveCaches.poll()
    }
    n
  }

  /** The exact skyline of `df` over `maxCols` (maximize) and
    * `minCols` (minimize), all BIGINT. `idCol` names the key column
    * carried through. Returns the frontier rows (idCol ++ dims).
    *
    * The exact stage is gated on |shell| (a control-plane count over
    * the persisted shell): at or below `broadcastShellLimit` it is
    * the one broadcast anti-join self-test; above it — the strongly
    * anti-correlated corpus whose frontier grows with n, where a
    * broadcast would blow the limit and the |shell|² nested loop a
    * deadline — it switches to the GRID-PARTITIONED exact stage
    * ([[exactPartitioned]]): equi-joins on cell keys only, work
    * Σ|A|·|B| over dominance-admissible cell pairs, spread across
    * the cluster. Same result, proven by the spec forcing both
    * paths onto the same corpus.
    *
    * DRAIN OBLIGATION: the gate persists the shell and registers it
    * in a process-global cache so the returned (lazy) frontier frame
    * reuses it instead of recomputing phases 1+2 — the caller must
    * call [[unpersistShellCaches]] after CONSUMING the result (the
    * [[DedupOps]] shingle-cache lifecycle; Bench/Verify and
    * [[graft.streaming.IncrementalSkyline]] drain per query/fold). A
    * caller that never drains accumulates cached blocks; a drain from
    * another thread is safe but recomputes any still-in-flight
    * query's shell (persisted frames recompute transparently). */
  def skyline(df: DataFrame, idCol: String, maxCols: Seq[String],
      minCols: Seq[String], g: Int = 8,
      broadcastShellLimit: Long = 100000L): DataFrame = {
    val dims = maxCols ++ minCols
    val reduced = shell(df, idCol, maxCols, minCols, g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    liveCaches.add(reduced)
    val nShell = reduced.count()

    if (nShell <= broadcastShellLimit) {
      // exact dominance on the reduced shell
      val s2 = reduced.select(
        col(idCol).as("d_id") +: dims.map(d => col(d).as(s"d_$d")): _*)
      reduced.join(broadcast(s2), dom(maxCols, minCols), "left_anti")
        .select(col(idCol) +: dims.map(col): _*)
    } else
      // 8× finer grid than the prune: a frontier band occupies
      // ~gE^(d−1) cells (it is (d−1)-dimensional), so the cell-pair
      // test stays control-plane while per-cell quadratics shrink
      // with gE²
      exactPartitioned(reduced, idCol, maxCols, minCols, 8 * g)
  }

  /** The exact dominance stage WITHOUT a broadcast: shell points are
    * re-bucketed on the g-grid (extremes over the SHELL — tighter
    * than the corpus grid), per-cell corner summaries (≤ g^d rows,
    * control-plane) drive a dominance-ADMISSIBILITY test between
    * cell pairs (B may dominate into A iff B's best corner weakly
    * dominates A's worst corner — a NECESSARY condition for any
    * b∈B dominating a∈A, so keeping only admissible pairs is
    * lossless), and points meet candidate dominators through two
    * equi-joins on cell keys. Dominated ids fall out of one distinct;
    * the frontier is the id anti-join. No broadcast of anything
    * point-sized, no single task: worst-case compare volume is
    * Σ|A|·|B| over admissible pairs (an anti-correlated band pairs
    * each cell with itself and its diagonal neighbors — ≈ |shell|²/g
    * spread over the cell-pair partitions; raise `g` to tighten
    * quadratically). */
  def exactPartitioned(shellPts: DataFrame, idCol: String,
      maxCols: Seq[String], minCols: Seq[String],
      g: Int = 8): DataFrame = {
    val dims = maxCols ++ minCols
    val extAggs = dims.map(d => min(col(d)).as(s"mn_$d")) ++
      dims.map(d => max(col(d)).as(s"mx_$d"))
    val ext = shellPts.agg(extAggs.head, extAggs.tail: _*)
    val bucketCols = dims.map { d =>
      least(lit(g - 1L), greatest(lit(0L),
        expr(s"(($d - mn_$d) * ${g}L) div (mx_$d - mn_$d + 1L)")))
        .as(s"b_$d")
    }
    val bucketed = shellPts.crossJoin(broadcast(ext))
      .select((col(idCol) +: dims.map(col)) ++ bucketCols: _*)
    val cornerAggs: Seq[Column] =
      maxCols.flatMap(d => Seq(min(col(d)).as(s"worst_$d"),
        max(col(d)).as(s"best_$d"))) ++
        minCols.flatMap(d => Seq(max(col(d)).as(s"worst_$d"),
          min(col(d)).as(s"best_$d")))
    val cells = bucketed.groupBy(dims.map(d => col(s"b_$d")): _*)
      .agg(cornerAggs.head, cornerAggs.tail: _*)
    // admissible (A ← B) cell pairs: some b∈B could dominate some
    // a∈A only if B's best is ≥ A's worst on every maximize-dim and
    // ≤ on every minimize-dim (self-pairs qualify — intra-cell
    // dominance is real). Both frames ≤ g^d rows.
    val a = cells.select(cells.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = cells.select(cells.columns.map(c => col(c).as(s"c_$c")): _*)
    val mayDom =
      (maxCols.map(d => col(s"c_best_$d") >= col(s"a_worst_$d")) ++
        minCols.map(d => col(s"c_best_$d") <= col(s"a_worst_$d")))
        .reduce(_ && _)
    val pairs = a.join(broadcast(b), mayDom)
      .select(dims.map(d => col(s"a_b_$d").as(s"b_$d")) ++
        dims.map(d => col(s"c_b_$d").as(s"p_$d")): _*)
    // candidate (point, dominator) meetings: two cell-key equi-joins
    val bPts = bucketed.select(
      (col(idCol).as("d_id") +: dims.map(d => col(d).as(s"d_$d"))) ++
        dims.map(d => col(s"b_$d").as(s"p_$d")): _*)
    val dominated = bucketed
      .join(pairs, dims.map(d => s"b_$d"))
      .join(bPts, dims.map(d => s"p_$d"))
      .filter(dom(maxCols, minCols))
      .select(col(idCol)).distinct()
    shellPts.join(dominated, Seq(idCol), "left_anti")
      .select(col(idCol) +: dims.map(col): _*)
  }

  /** Phases 1+2 — the operand of the final exact self-join, after BOTH
    * lossless filters: the cell-corner prune AND the per-cell
    * REPRESENTATIVE filter. The corner prune alone fails on
    * anti-correlated metrics (the frontier band is thick, so few
    * cells are wholly dominated — measured 97.6% survivors on the
    * token/type/byte corpus): the rep filter closes that gap by
    * anti-joining every survivor against ONE best-scoring point per
    * occupied cell (≤ g^d rows, broadcast). Any subset is a SOUND
    * dominance filter — removing points some rep strictly dominates
    * can never remove a frontier point — so losslessness is
    * structural, and reps cover the frontier band densely because
    * every occupied cell contributes one. Public for scale probing:
    * |shell| decides whether the plan holds at 100 TB. */
  def shell(df: DataFrame, idCol: String, maxCols: Seq[String],
      minCols: Seq[String], g: Int = 8): DataFrame = {
    val dims = maxCols ++ minCols
    val survivors = pruneSurvivors(df, idCol, maxCols, minCols, g)

    // representative champions: at a 4× finer grid than the corner
    // prune, each (finer) cell contributes its best row per score
    // direction — one per dim objective plus the balanced sum —
    // computed as d+1 max(struct(score, tiebreak-id, payload))
    // aggregates in ONE map-side-combined groupBy: no window, no
    // per-cell sort, no hot partitions (a window partitioned by
    // ≤ g^d cells over a corpus-sized input would funnel ~n/g^d rows
    // through single tasks — the skew this formulation avoids).
    // Champs are ≤ (d+1)·(4g)^d rows — control-plane bounded — and
    // ANY subset is a sound dominance filter, so the anti-join below
    // is lossless by construction.
    val extAggs = dims.map(d => min(col(d)).as(s"mn_$d")) ++
      dims.map(d => max(col(d)).as(s"mx_$d"))
    val ext = df.agg(extAggs.head, extAggs.tail: _*)
    val gR = 4L * g
    val repBuckets = dims.map { d =>
      least(lit(gR - 1L), greatest(lit(0L),
        expr(s"(($d - mn_$d) * ${gR}L) div (mx_$d - mn_$d + 1L)")))
        .as(s"rb_$d")
    }
    val perDim = maxCols.map(d =>
      expr(s"(($d - mn_$d) * 1000000L) div (mx_$d - mn_$d + 1L)")) ++
      minCols.map(d =>
        expr(s"((mx_$d - $d) * 1000000L) div (mx_$d - mn_$d + 1L)"))
    val balanced = perDim.reduce(_ + _)
    val scored = survivors.crossJoin(broadcast(ext))
      .select((col(idCol) +: dims.map(col)) ++ repBuckets ++
        perDim.zipWithIndex.map { case (sc, i) => sc.as(s"_sc$i") } :+
        balanced.as("_rbal"): _*)
    val champAggs = (perDim.indices.map(i => col(s"_sc$i")) :+
      col("_rbal").cast("long"))
      .zipWithIndex.map { case (sc, i) =>
        max(struct((sc.as("s") +: col("_rbal").as("b") +:
          col(idCol).as("d_id") +:
          dims.map(d => col(d).as(s"d_$d"))): _*)).as(s"_ch$i")
      }
    val nCh = champAggs.length
    val champs = scored
      .groupBy(dims.map(d => col(s"rb_$d")): _*)
      .agg(champAggs.head, champAggs.tail: _*)
      .select(explode(array((0 until nCh).map(i =>
        col(s"_ch$i")): _*)).as("_c"))
      .select(col("_c.d_id").as("d_id") +:
        dims.map(d => col(s"_c.d_$d").as(s"d_$d")): _*)
      .dropDuplicates("d_id")
    survivors.join(broadcast(champs), dom(maxCols, minCols),
      "left_anti")
  }

  /** Strict dominance of the `d_`-prefixed side over the plain side. */
  private def dom(maxCols: Seq[String],
      minCols: Seq[String]): Column =
    (maxCols.map(d => col(s"d_$d") >= col(d)) ++
      minCols.map(d => col(s"d_$d") <= col(d))).reduce(_ && _) &&
    (maxCols.map(d => col(s"d_$d") > col(d)) ++
      minCols.map(d => col(s"d_$d") < col(d))).reduce(_ || _)

  /** Phase 1 alone — the points surviving the lossless cell-corner
    * prune (a superset of [[shell]], itself a superset of the
    * frontier). Public for scale probing. */
  def pruneSurvivors(df: DataFrame, idCol: String, maxCols: Seq[String],
      minCols: Seq[String], g: Int = 8): DataFrame = {
    require(maxCols.nonEmpty || minCols.nonEmpty, "need a dimension")
    require(g >= 2, "need g >= 2 buckets per dim")
    val dims = maxCols ++ minCols

    // per-dim corpus extremes: one 1-row aggregate, broadcast
    val extAggs = dims.map(d => min(col(d)).as(s"mn_$d")) ++
      dims.map(d => max(col(d)).as(s"mx_$d"))
    val ext = df.agg(extAggs.head, extAggs.tail: _*)
    val bucketCols = dims.map { d =>
      least(lit(g - 1L), greatest(lit(0L),
        expr(s"(($d - mn_$d) * ${g}L) div (mx_$d - mn_$d + 1L)")))
        .as(s"b_$d")
    }
    val bucketed = df.crossJoin(broadcast(ext))
      .select((col(idCol) +: dims.map(col)) ++ bucketCols: _*)

    // occupied-cell corner summaries: per cell, the WORST corner
    // (min on maximize-dims, max on minimize-dims — every point of
    // the cell is at least this good) and the BEST corner (the
    // reverse: no point of the cell is better than this)
    val cornerAggs: Seq[Column] =
      maxCols.flatMap(d => Seq(min(col(d)).as(s"worst_$d"),
        max(col(d)).as(s"best_$d"))) ++
        minCols.flatMap(d => Seq(max(col(d)).as(s"worst_$d"),
          min(col(d)).as(s"best_$d")))
    val cells = bucketed.groupBy(dims.map(d => col(s"b_$d")): _*)
      .agg(cornerAggs.head, cornerAggs.tail: _*)

    // cell-level prune: drop cell A when an occupied cell B's worst
    // corner strictly dominates A's best corner (both frames ≤ g^d
    // rows — a control-plane-sized broadcast join)
    val a = cells.select(cells.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = cells.select(cells.columns.map(c => col(c).as(s"c_$c")): _*)
    val cellDom =
      (maxCols.map(d => col(s"c_worst_$d") >= col(s"a_best_$d")) ++
        minCols.map(d => col(s"c_worst_$d") <= col(s"a_best_$d")))
        .reduce(_ && _) &&
      (maxCols.map(d => col(s"c_worst_$d") > col(s"a_best_$d")) ++
        minCols.map(d => col(s"c_worst_$d") < col(s"a_best_$d")))
        .reduce(_ || _)
    val prunedCells = a.join(broadcast(b), cellDom, "left_semi")
      .select(dims.map(d => col(s"a_b_$d").as(s"b_$d")): _*)

    // survivors: points outside pruned cells (equi-join on cell key)
    bucketed.join(prunedCells, dims.map(d => s"b_$d"), "left_anti")
  }
}
