package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** MAINTAINED PageRank over the maintained kNN graph — the warm-start
  * composition the cdc49 verdict named: cdc49 recomputes the full
  * power iteration per refresh even though only the graph FOLD is
  * incremental. This service keys a rank table by the graph's
  * committed watermark and, on refresh, seeds the fixed-point
  * iteration ([[GraphOps.pageRankFixedPoint]]) from the PREVIOUS
  * committed ranks: the fixed point is a property of the graph alone,
  * so the warm start lands on the IDENTICAL integer vector the cold
  * start reaches (spec-pinned, exact equality) — in the few rounds
  * the graph delta actually moved instead of the cold mixing time
  * (probe-measured).
  *
  * Snapshot consistency: the rank table carries the graph VERSION it
  * was computed at (`graft.rankwm` = "watermark:delete-epoch",
  * written AFTER the TableSwap swap — a crash in between re-runs the
  * refresh, idempotent), and [[serve]] refuses when the stored
  * version lags the graph: a consumer either reads ranks THAT MATCH
  * the graph version or knows to refresh first — never a silent mix
  * (the WaveMark doctrine applied to a derived view). The delete
  * epoch matters because [[IncrementalKnnGraph.deleteVectors]]
  * mutates the graph without moving the fold watermark — without it
  * a post-erasure refresh would no-op and serve ranks still naming
  * the erased vectors. */
object IncrementalPageRank {

  private val WmProp = "graft.rankwm"

  /** The graph's version as the rank table keys it: the committed
    * fold watermark PLUS the delete epoch — [[IncrementalKnnGraph
    * .deleteVectors]] mutates the served graph without moving the
    * watermark, so the watermark alone would let refresh() no-op
    * after an erasure and serve() hand out ranks still naming the
    * erased vectors. */
  private def graphVersion(spark: SparkSession,
      graphTable: String): String = {
    val wm = IncrementalKnnGraph.committedBatch(spark, graphTable)
    val epoch = IncrementalKnnGraph.mutationEpoch(spark, graphTable)
    s"$wm:$epoch"
  }

  /** All tables the service maintains — for test/registration
    * cleanup. */
  def tables(rankTable: String): Seq[String] =
    Seq(rankTable, s"${rankTable}_stage", s"${rankTable}_old")

  /** Bring `rankTable` to the graph's committed watermark: no-op if
    * already there (returns rounds = 0), else a fixed-point iteration
    * WARM-STARTED from the stored ranks (cold on first call).
    * `vertices` is the graph's vertex universe (one `vid` row each —
    * the teleport distribution, exactly [[GraphOps.pageRank]]'s
    * contract). Returns (graph watermark, rounds executed). */
  def refresh(spark: SparkSession, graphTable: String,
      rankTable: String, vertices: DataFrame,
      maxIters: Int = 500): (Long, Int) = {
    val wm = IncrementalKnnGraph.committedBatch(spark, graphTable)
    val version = graphVersion(spark, graphTable)
    TableSwap.recover(spark, rankTable, s"${rankTable}_stage")
    val stored = storedWm(spark, rankTable)
    if (stored.contains(version)) return (wm, 0)
    val edges = IncrementalKnnGraph.graphView(spark, graphTable)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    // warm seed = previous ranks, RENORMALIZED then given HEADROOM:
    //  - renormalized because the fixed point scales with the
    //    per-vertex teleport mass (fp = (I − d·P)⁻¹ · tele·1): a
    //    grown vertex count shrinks every rank by n_old/n_new, so
    //    the raw old ranks would sit ~(n_new/n_old)× off target;
    //  - headroom (×8 + 2²⁰) because the Tarski descent's exactness
    //    needs the seed AT OR ABOVE the new gfp pointwise — covered
    //    for any vertex whose rank grows ≤ 8× (+ a million parts of
    //    10¹²) across one ingest wave (a ×2 headroom was measured
    //    violated by hub growth and forced the restart); headroom is
    //    nearly free in rounds (the descent contracts the gap
    //    geometrically — log cost), while a violation trips the
    //    detector and pays a full cold restart. Exactness never
    //    depends on this heuristic, only the round count does.
    // Precision is irrelevant (the descent is seed-independent in
    // its RESULT), so plain double arithmetic is fine.
    val init =
      if (stored.isEmpty) None
      else {
        val nOld = spark.table(rankTable).count()
        val nNew = vertices.count()
        val f = 8.0 * nOld.toDouble / nNew
        Some(spark.table(rankTable)
          .select(col("vid"),
            ((col("pr") * lit(f)).cast("long") + lit(1048576L))
              .as("pr")))
      }
    val (ranks, rounds) = GraphOps.pageRankFixedPoint(edges, vertices,
      init, maxIters)
    TableSwap.writeStaged(spark, ranks, rankTable)
    CdcMerge.setTableProp(spark, rankTable, WmProp, version)
    (wm, rounds)
  }

  /** The maintained ranks, SNAPSHOT-CHECKED against the graph: throws
    * when the stored watermark differs from the graph's committed one
    * (refresh first) — a lagging rank table must never serve as if it
    * matched the current graph. */
  def serve(spark: SparkSession, graphTable: String,
      rankTable: String): DataFrame = {
    val version = graphVersion(spark, graphTable)
    val stored = storedWm(spark, rankTable)
    if (!stored.contains(version)) throw new IllegalStateException(
      s"$rankTable is at graph version " +
        s"${stored.getOrElse("<none>")} but $graphTable is at " +
        s"$version (watermark:delete-epoch) — refresh before " +
        "serving (version-skewed ranks must refuse, not mix)")
    spark.catalog.refreshTable(rankTable)
    spark.table(rankTable)
  }

  private def storedWm(spark: SparkSession,
      rankTable: String): Option[String] = {
    if (!spark.catalog.tableExists(rankTable)) None
    else CdcMerge.tableProp(spark, rankTable, WmProp)
  }
}
