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
  *
  * Concurrency: the recorded value is "the LATEST-FINISHING outermost
  * fold since [[reset]]", decided by a CAS on the fold's end
  * timestamp — concurrent outermost folds on different threads (two
  * ingest streams on one JVM) can no longer clobber a later-finishing
  * fold's duration with an earlier one's. For a serial single-stream
  * harness (the bench) this is exactly "the last fold"; for a
  * concurrent harness it attributes whichever fold COMPLETED last,
  * which may belong to a different stream than the caller's — per-
  * stream attribution needs a serial harness.
  */
object FoldTimer {

  private val depth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }
  // (end nanoTime, duration ns) of the latest-FINISHING outermost fold
  private val last =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long)](
      (Long.MinValue, -1L))

  /** Forget any recorded fold — call before a measured region. */
  def reset(): Unit = last.set((Long.MinValue, -1L))

  /** Duration of the last OUTERMOST fold since [[reset]], if any. */
  def lastFoldSeconds: Option[Double] = {
    val d = last.get._2
    if (d < 0) None else Some(d / 1e9)
  }

  /** Label every Spark job submitted by `f` with `label` (the guide's
    * §1.5 job-description discipline): fold internals are 10+ jobs per
    * call, and wall-clock attribution inside a fold is impossible
    * without per-step labels. Thread-local, restored on exit;
    * measurement-only — zero effect on the fold's behavior. */
  def step[T](spark: org.apache.spark.sql.SparkSession,
      label: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try f
    finally sc.setJobDescription(prev)
  }

  /** Time `f` as a fold; only the outermost nested call records. */
  def timed[T](f: => T): T = {
    val d: Int = depth.get
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) {
        val end = System.nanoTime()
        val mine = (end, end - t0)
        var done = false
        while (!done) {
          val cur = last.get
          done = cur._1 >= end || last.compareAndSet(cur, mine)
        }
      }
    }
  }
}
