package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / theta) distinct-value sketches — the
  * mergeable set sketch that, unlike HLL (q57), supports SET
  * ALGEBRA: because the sketch IS a uniform hash sample of the
  * distinct values below a threshold θ, intersections and
  * differences estimate by plain set operations on the samples —
  * audience overlap between segments at 100 TB without ever
  * co-shuffling the raw sets.
  *
  * Determinism doctrine: the value hash is the doc08 40-bit md5 gate
  * (exact integer arithmetic, replayable on any engine), the sketch
  * is "k smallest distinct hashes" (a pure set function — partition
  * order cannot matter), and every estimate is a truncating integer
  * division. No RNG, no floats.
  *
  * Estimator (classical KMV, θ exclusive): a full sketch's k-th
  * smallest hash is θ; the k−1 hashes strictly below it are a
  * uniform sample of the value space at rate θ/2⁴⁰, so
  * `distinct ≈ cnt(h < θ) · 2⁴⁰ div θ`. An undersized sketch
  * (n < k) saw every value: θ = 2⁴⁰ makes the same formula return
  * the exact count. Intersection: at θ = min(θ_a, θ_b) both sketches
  * are complete samples of the SAME rate, so the common hashes below
  * θ estimate the overlap with the identical formula. All products
  * bounded by k·2⁴⁰ < 2⁴⁷ — BIGINT-safe on both engines.
  *
  * Scale shape: one distinct per segment (the shuffle the exact
  * answer needs anyway), then `orderBy(h).limit(k)` — a distributed
  * TakeOrdered reduction (partial top-k per partition, k-row merge),
  * NOT a per-segment window sort. Sketches are k rows: every
  * downstream estimate is control-plane-sized.
  */
object SketchOps {

  /** 2⁴⁰ — the hash space size; also θ for an undersized sketch. */
  val Theta40: Long = 1L << 40

  /** 40-bit md5 value hash (the doc08 gate idiom). */
  def u40(v: Column): Column =
    conv(substring(md5(v.cast("string").cast("binary")), 1, 10), 16, 10)
      .cast("long")

  /** Count-Min Sketch counter grid over an item stream — the
    * FREQUENCY member of the sketch family (q57 HLL = distinct
    * counts, q58 KMV = set algebra, this = per-item counts): d
    * seeded hash rows × w buckets of plain BIGINT counters, built by
    * ONE map-side-combined aggregate over the exploded items. The
    * counters are pure SUMS, so grids merge (and maintain
    * incrementally — [[graft.streaming.IncrementalCms]]) by cell-wise
    * addition; estimate(item) = min over rows of its d counters,
    * which can only OVERCOUNT (collisions add, never subtract) —
    * estimate ≥ truth always, ≤ truth + εN with probability 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Grid size d·w is a constant: at 100 TB
    * the sketch answers heavy-hitter / frequency queries from KBs of
    * state while the exact answer needs a vocabulary-sized shuffle.
    * Row hash j is the doc08 idiom seeded by prefixing "j:" — exact
    * integer arithmetic, engine-replayable. */
  def cmsGrid(items: DataFrame, itemCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2, "need d >= 1 hash rows and w >= 2 buckets")
    items
      .select((0 until d).map(j =>
        pmod(u40(concat(lit(s"$j:"), col(itemCol).cast("string"))),
          lit(w.toLong)).as(s"b$j")): _*)
      .select(posexplode(array((0 until d).map(j => col(s"b$j")): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row").cast("long").as("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate lookup: min over the d counters each queried item
    * hashes to. `grid` is a [[cmsGrid]] frame; `queries` one row per
    * item. Returns (item, est). Missing cells count 0 (an item the
    * stream never touched can still collide, so est ≥ 0 stays an
    * overcount bound). */
  def cmsEstimate(grid: DataFrame, queries: DataFrame,
      itemCol: String, d: Int = 4, w: Int = 256): DataFrame = {
    val probes = queries
      .select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"), posexplode(array((0 until d).map(j =>
        pmod(u40(concat(lit(s"$j:"), col("item").cast("string"))),
          lit(w.toLong))): _*)).as(Seq("row", "bucket")))
      .select(col("item"), col("row").cast("long").as("row"),
        col("bucket"))
    probes
      .join(grid, Seq("row", "bucket"), "left_outer")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Bloom filter bit set over a member stream — the MEMBERSHIP
    * member of the sketch family (q57 HLL = distinct counts, q58 KMV
    * = set algebra, doc39 CMS = frequencies, this = "have I seen this
    * item?"): `d` seeded hashes (the CMS seed discipline — u40 of
    * "j:item") map each member into an `m`-bit array; the state is
    * the DISTINCT set bits, ≤ m rows forever whatever the stream —
    * the cross-snapshot dedup / decontamination primitive at 100 TB,
    * where the exact member set is a join nobody wants to ship.
    * Built by one map-side-combined distinct over the exploded
    * probes. Returns the set bits as a (bit) frame. */
  def bloomBits(items: DataFrame, itemCol: String, d: Int = 3,
      m: Int = 1024): DataFrame = {
    require(d >= 1 && m >= 2, "need d >= 1 hashes and m >= 2 bits")
    items
      .select(posexplode(array((0 until d).map(j =>
        pmod(u40(concat(lit(s"$j:"), col(itemCol).cast("string"))),
          lit(m.toLong))): _*)).as(Seq("j", "bit")))
      .select(col("bit")).distinct()
  }

  /** Membership probe: an item MIGHT be a member iff all `d` of its
    * bits are set. No false negatives ever (a member's bits were all
    * set at build time — the guarantee the doc42 oracle pins
    * structurally); false positives at the classic (1−e^(−dn/m))^d
    * rate, and both engines replay the same hashes so even the FP
    * rows hash-match. Sizing honesty: the bit frame is ≤ m rows, and
    * `broadcastBits` (default) is right while m fits an executor —
    * a 10⁹-member set at 1% FP wants m ≈ 10¹⁰, where the probe must
    * instead run as the plain keyed equi-join on `bit` (pass
    * `broadcastBits = false` and let AQE pick), ideally over a
    * word-packed (bit div 64 → OR mask) representation that cuts the
    * frame 64×. Returns (item, might_contain). */
  def bloomMightContain(bits: DataFrame, queries: DataFrame,
      itemCol: String, d: Int = 3, m: Int = 1024,
      broadcastBits: Boolean = true): DataFrame = {
    val probes = queries
      .select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"), posexplode(array((0 until d).map(j =>
        pmod(u40(concat(lit(s"$j:"), col("item").cast("string"))),
          lit(m.toLong))): _*)).as(Seq("j", "bit")))
      .select(col("item"), col("bit"))
    val hitSide = bits.withColumn("_hit", lit(1L))
    probes
      .join(if (broadcastBits) broadcast(hitSide) else hitSide,
        Seq("bit"), "left_outer")
      .groupBy("item")
      .agg((count(col("_hit")) === d).as("might_contain"))
  }

  /** Fixed-domain equi-width HISTOGRAM sketch — the QUANTILE member
    * of the sketch family (q57 HLL distinct, q58 KMV set algebra,
    * doc39 CMS frequency, doc42 Bloom membership, this = order
    * statistics): `w` BIGINT counters per group over the REGISTERED
    * integer domain [lo, hi). The counters are pure sums, so
    * sketches merge (and maintain incrementally —
    * [[graft.streaming.IncrementalHist]]) by bin-wise addition;
    * state is ≤ w rows per group forever. Quantile estimates from
    * the sketch carry the classic equi-width guarantee: the estimate
    * lands in the bin containing the true quantile, so
    * |est − truth| < bin width = (hi−lo)/w — at 100 TB that answers
    * p50/p99 latency/price/length questions from KBs of state while
    * the exact answer needs a global sort.
    *
    * The domain is REGISTERED UP FRONT (the incremental contract: a
    * bin's meaning can never change once batches fold in);
    * out-of-domain values clamp into the edge bins, degrading the
    * edge estimates but never the count. All arithmetic is BIGINT
    * (requires (hi−lo)·w < 2⁶³). Returns (grpCol, bin, cnt). */
  def histSketch(df: DataFrame, grpCol: String, valCol: String,
      lo: Long, hi: Long, w: Int): DataFrame = {
    require(hi > lo && w >= 2, "need hi > lo and w >= 2 bins")
    df.select(col(grpCol),
        least(lit(w - 1L), greatest(lit(0L),
          expr(s"(($valCol - ${lo}L) * ${w}L) div ${hi - lo}L")))
          .as("bin"))
      .groupBy(grpCol, "bin")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[histSketch]] frame, one row per
    * (group, quantile): rank r = ceil(n·q) located by the per-group
    * cumulative bin counts (a window PARTITIONED by group, ≤ w rows
    * each), then linear interpolation inside the bin on the
    * truncating integer grid — est = bin_lo +
    * ((bin_hi−bin_lo)·p) div (cnt+1) with p = r − cum_before, which
    * stays inside [bin_lo, bin_hi) and is replayable on any engine.
    * Returns (grpCol, q_ppm, n, target_rank, bin, bin_lo, bin_hi,
    * est). */
  def histQuantiles(hist: DataFrame, grpCol: String, qsPpm: Seq[Long],
      lo: Long, hi: Long, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(grpCol)).orderBy(col("bin"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(win))
    val targets = hist.groupBy(col(grpCol))
      .agg(sum(col("cnt")).as("n"))
      .select(col(grpCol), col("n"),
        explode(array(qsPpm.map(lit(_)): _*)).as("q_ppm"))
      .withColumn("target_rank",
        greatest(lit(1L), expr("(n * q_ppm + 999999L) div 1000000L")))
    targets.join(cum, Seq(grpCol))
      .filter(col("cum") - col("cnt") < col("target_rank") &&
        col("target_rank") <= col("cum"))
      .withColumn("bin_lo", expr(s"${lo}L + (bin * ${hi - lo}L) div ${w}L"))
      .withColumn("bin_hi",
        expr(s"${lo}L + ((bin + 1L) * ${hi - lo}L) div ${w}L"))
      .select(col(grpCol), col("q_ppm"), col("n"), col("target_rank"),
        col("bin"), col("bin_lo"), col("bin_hi"),
        expr("""bin_lo + ((bin_hi - bin_lo) *
          (target_rank - (cum - cnt))) div (cnt + 1L)""").as("est"))
  }

  /** KMV sketch: the `k` smallest 40-bit hashes of the column's
    * DISTINCT values, as a k-row (h) frame. Plans as distinct →
    * TakeOrderedAndProject — no global sort, no single-task window. */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    df.select(u40(col(valueCol)).as("h")).distinct()
      .orderBy("h").limit(k)
  }

  /** Per-segment (theta, n) over a unioned sketch frame tagged by
    * `segCol` — theta = k-th smallest hash for a full sketch, 2⁴⁰
    * for an undersized one (the uniform-formula trick above). */
  def kmvStats(sketches: DataFrame, segCol: String, k: Int): DataFrame =
    sketches.groupBy(col(segCol))
      .agg(max("h").as("mx"), count(lit(1)).as("n"))
      .withColumn("theta",
        when(col("n") < k, lit(Theta40)).otherwise(col("mx")))
      .select(col(segCol), col("theta"), col("n"))

  /** The q58 audience-overlap report from an already-built sketch
    * frame (`seg`, `h`) plus the exact distinct (`seg`, value) frame
    * that grades it: per-pair segment estimates, intersection
    * estimate, and the exact counts in the same rows. Shared by q58
    * (fresh sketches) and cdc32 (sketches served from the
    * incrementally-maintained table) — byte-shared code, so
    * maintained == one-shot is structural. Every join operand here is
    * sketch-sized (k rows per segment) except the exact-count grading
    * frames the oracle needs anyway. */
  def overlapReport(sketches: DataFrame, u: DataFrame,
      k: Int): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val segs = u.select($"seg").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val st = kmvStats(sketches, "seg", k)
    val cnt = sketches.join(st, Seq("seg")).filter($"h" < $"theta")
      .groupBy("seg").agg(count(lit(1)).as("c"))
    val est = st.join(cnt, Seq("seg"), "left_outer")
      .select($"seg",
        expr(s"(coalesce(c, 0L) * ${Theta40}L) div theta").as("est"))
    val pairsDf = segs.combinations(2).toSeq
      .map { case Seq(a, b) => (a, b) }.toDF("seg_a", "seg_b")
    val sta = st.select($"seg".as("seg_a"), $"theta".as("tha"))
    val stb = st.select($"seg".as("seg_b"), $"theta".as("thb"))
    val com = sketches.select($"seg".as("seg_a"), $"h")
      .join(sketches.select($"seg".as("seg_b"), $"h"), Seq("h"))
      .filter($"seg_a" < $"seg_b")
      .join(sta, Seq("seg_a")).join(stb, Seq("seg_b"))
      .filter($"h" < least($"tha", $"thb"))
      .groupBy("seg_a", "seg_b").agg(count(lit(1)).as("cc"))
    val estI = pairsDf
      .join(sta, Seq("seg_a")).join(stb, Seq("seg_b"))
      .join(com, Seq("seg_a", "seg_b"), "left_outer")
      .select($"seg_a", $"seg_b",
        expr(s"(coalesce(cc, 0L) * ${Theta40}L) div least(tha, thb)")
          .as("est_inter"))
    val exSeg = u.groupBy($"seg").agg(count(lit(1)).as("exact"))
    val exInter = u.select($"seg".as("seg_a"), $"v")
      .join(u.select($"seg".as("seg_b"), $"v"), Seq("v"))
      .filter($"seg_a" < $"seg_b")
      .groupBy("seg_a", "seg_b").agg(count(lit(1)).as("exact_inter"))
    estI
      .join(est.select($"seg".as("seg_a"), $"est".as("est_a")),
        Seq("seg_a"))
      .join(est.select($"seg".as("seg_b"), $"est".as("est_b")),
        Seq("seg_b"))
      .join(exSeg.select($"seg".as("seg_a"), $"exact".as("exact_a")),
        Seq("seg_a"))
      .join(exSeg.select($"seg".as("seg_b"), $"exact".as("exact_b")),
        Seq("seg_b"))
      .join(exInter, Seq("seg_a", "seg_b"), "left_outer")
      .select($"seg_a", $"seg_b", $"est_a", $"est_b", $"est_inter",
        $"exact_a", $"exact_b",
        coalesce($"exact_inter", lit(0L)).as("exact_inter"))
  }
}
