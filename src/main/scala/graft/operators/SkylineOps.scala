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
  * frontier point is ever inside a pruned cell. Phase 2 runs the
  * exact pairwise test only on the surviving shell (an anti-equi-
  * join on cell key selects survivors; the shell self-join is the
  * only non-equi join and its operand is the pruned set). Cost
  * honesty: the final stage is |survivors|²; for corpus-metric
  * distributions (correlated axes) the shell is thin, but a
  * perfectly anti-correlated corpus has a large frontier and no
  * algorithm avoids producing it. Raise `g` to tighten the prune.
  *
  * Dominance is on INTEGER metrics (the doc23 doctrine) — b
  * dominates a iff b is ≥ on every maximize-dim, ≤ on every
  * minimize-dim, and strictly better on at least one. Ties (equal
  * on every dim) dominate in neither direction: both stay.
  */
object SkylineOps {

  /** The exact skyline of `df` over `maxCols` (maximize) and
    * `minCols` (minimize), all BIGINT. `idCol` names the key column
    * carried through. Returns the frontier rows (idCol ++ dims). */
  def skyline(df: DataFrame, idCol: String, maxCols: Seq[String],
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
    val survivors = bucketed.join(prunedCells,
      dims.map(d => s"b_$d"), "left_anti")

    // exact dominance on the shell
    val s2 = survivors.select(
      col(idCol).as("d_id") +: dims.map(d => col(d).as(s"d_$d")): _*)
    val pointDom =
      (maxCols.map(d => col(s"d_$d") >= col(d)) ++
        minCols.map(d => col(s"d_$d") <= col(d))).reduce(_ && _) &&
      (maxCols.map(d => col(s"d_$d") > col(d)) ++
        minCols.map(d => col(s"d_$d") < col(d))).reduce(_ || _)
    survivors.join(broadcast(s2), pointDom, "left_anti")
      .select(col(idCol) +: dims.map(col): _*)
  }
}
