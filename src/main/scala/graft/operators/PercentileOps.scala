package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped percentiles with an explicit scale contract.
  *
  *  - [[PercentileOps.Exact]]: Spark's `percentile` (linear
  *    interpolation, matches DuckDB `quantile_cont` bit-for-bit). The
  *    aggregation buffers EVERY value per group on one reducer — with
  *    few groups over a huge table that is a near-full-table buffer on
  *    a handful of reducers. Correct at oracle/test SF; a scale-killer
  *    at 100 TB. Use only when exactness is contractual.
  *  - [[PercentileOps.Approx]] (the 100 TB default): Spark's
  *    `approx_percentile` — a GK quantile sketch of bounded size
  *    O(accuracy), merged associatively map-side like any other
  *    partial aggregate. Rank error ≤ n/accuracy; no per-group
  *    full-value buffer anywhere in the plan (asserted by
  *    PlanQualitySpec).
  */
object PercentileOps {

  sealed trait Mode
  case object Exact extends Mode
  final case class Approx(accuracy: Int = 10000) extends Mode

  /** Grouped percentiles of `value` per `group`. All probs evaluate in
    * ONE aggregate via the array form — a single sketch (Approx) or a
    * single value buffer (Exact) per group, however many percentiles
    * are requested.
    *
    * Exact mode is gated behind `allowExact = true`: its per-group
    * full-value buffer is a scale-killer on large groups (near-full-
    * table memory on a handful of reducers at 100 TB), so reaching it
    * must be a deliberate, visible decision at the call site — exact
    * semantics on bounded/sampled inputs only. The ungated default for
    * any scale is [[Approx]]. */
  def groupPercentiles(df: DataFrame, group: String, value: String,
      probs: Seq[Double], mode: Mode = Approx(),
      allowExact: Boolean = false): DataFrame = {
    require(mode != Exact || allowExact,
      "PercentileOps.Exact buffers every group value on one reducer — " +
        "a 100 TB scale-killer. Pass allowExact=true only for bounded " +
        "or sampled inputs where exactness is contractual; otherwise " +
        "use PercentileOps.Approx (GK sketch, bounded memory).")
    val arr = probs.mkString("array(", ", ", ")")
    val agg = (mode match {
      case Exact => expr(s"percentile($value, $arr)")
      case Approx(acc) => expr(s"approx_percentile($value, $arr, $acc)")
    }).as("_ps")
    val cols = col(group) +: probs.zipWithIndex.map { case (p, i) =>
      col("_ps").getItem(i).as(s"p${(p * 100).round}")
    } :+ col("n")
    df.groupBy(group).agg(agg, count(lit(1)).as("n"))
      .select(cols: _*)
  }
}
