package graft.streaming

/** Marginal-fold timing for the maintained-view family.
  *
  * The bench sweep's one-shot numbers for cdc16–40 mix harness
  * construction (table drops, fixture builds, N warm-up folds) with
  * the number that actually matters at 100 TB: the cost of ONE MORE
  * fold against warm state. This instrument records the duration of
  * the OUTERMOST fold call per thread; the bench reads the LAST value
  * recorded during a query — i.e. the final fold of the harness, the
  * one folding against the warmest state — and ships it as
  * `marginal_fold_s` next to the wall-clock second, so a verdict can
  * diff fold cost across rounds instead of harness noise.
  *
  * Nesting: composite folds call other folds internally
  * ([[IncrementalSpans.applyBatch]] → watermark write;
  * [[IncrementalFunnel.applyBatch]] → [[CdcMerge.applyBatchKeyed]]) —
  * the depth guard attributes the whole composite to the outermost
  * entry and ignores the inner spans. Measurement-only: zero effect
  * on any fold's behavior.
  */
object FoldTimer {

  private val depth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }
  @volatile private var lastNs: Long = -1L

  /** Forget any recorded fold — call before a measured region. */
  def reset(): Unit = lastNs = -1L

  /** Duration of the last OUTERMOST fold since [[reset]], if any. */
  def lastFoldSeconds: Option[Double] =
    if (lastNs < 0) None else Some(lastNs / 1e9)

  /** Time `f` as a fold; only the outermost nested call records. */
  def timed[T](f: => T): T = {
    val d: Int = depth.get
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) lastNs = System.nanoTime() - t0
    }
  }
}
