package graft.streaming

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.sources.Tables

/** IncrementalSemDedup: one batch over empty state equals the
  * one-shot emb27 operator; earlier-batch kept reps suppress later
  * arrivals but never the reverse; replays (watermark and content)
  * append nothing. */
class IncrementalSemDedupSpec extends SparkSpec {

  private val table = "semdedup_state"

  private def freshTable(): Unit =
    Seq(table, s"${table}_centroids")
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def decisions(): Map[Long, (Long, Boolean, Long)] =
    IncrementalSemDedup.readDecisions(spark, table).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("is_dup"),
          r.getAs[Long]("_batch")))).toMap

  test("single full batch over empty state equals one-shot emb27") {
    freshTable()
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    IncrementalSemDedup.applyBatch(spark, table, embs, 0L)
    val got = decisions()
    // same centroids: first 8 of the batch by vec_id == vec_id < 8
    val oneShot = SimilarityOps.semanticDedup(embs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Boolean]("is_dup")))).toMap
    assert(got.size == oneShot.size)
    oneShot.foreach { case (v, (cid, dup)) =>
      assert(got(v) == ((cid, dup, 0L)), s"vec $v")
    }
    assert(got.values.exists(_._2), "expected at least one dup")
  }

  test("kept reps suppress later arrivals; arrival order is the contract") {
    import spark.implicits._
    freshTable()
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    // batch 0: centroids 0 (+x) and 1 (+y); vec 2 is τ-close to 0
    // (cos ≈ .50) with a big e2 residual → dup in-batch (rule (b))
    IncrementalSemDedup.applyBatch(spark, table, Seq(
        (0L, v(0 -> 1f)), (1L, v(1 -> 1f)),
        (2L, v(0 -> 0.5f, 2 -> 0.87f))).toDF("vec_id", "embedding"),
      0L, nCells = 2)
    // batch 1: vec 3 near-parallel to the KEPT rep 0 → dup via rule
    // (a); vec 4 lands in cell 0 but below τ to every kept rep → kept
    IncrementalSemDedup.applyBatch(spark, table, Seq(
        (3L, v(0 -> 0.95f, 3 -> 0.05f)),
        (4L, v(0 -> 0.3f, 4 -> 0.95f))).toDF("vec_id", "embedding"),
      1L, nCells = 2)
    val got = decisions()
    assert(got(0L) == ((0L, false, 0L)) && got(1L) == ((1L, false, 0L)))
    assert(got(2L) == ((0L, true, 0L)))
    assert(got(3L) == ((0L, true, 1L)), "τ-close to earlier kept rep")
    assert(got(4L) == ((0L, false, 1L)), "below τ to all kept reps")
    // a dup NEVER becomes a rep: vec 5 = e2 is τ-close to DUP vec 2
    // (cos ≈ .87) but below τ to every KEPT rep → kept
    IncrementalSemDedup.applyBatch(spark, table, Seq(
        (5L, v(2 -> 1f))).toDF("vec_id", "embedding"), 2L, nCells = 2)
    assert(decisions()(5L)._2 == false)
  }

  test("replay by watermark and by content appends nothing") {
    import spark.implicits._
    freshTable()
    def v(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f); a(i % 64) = 1f; a
    }
    val b0 = Seq((0L, v(0)), (1L, v(1)), (2L, v(2)))
      .toDF("vec_id", "embedding")
    IncrementalSemDedup.applyBatch(spark, table, b0, 0L, nCells = 2)
    val before = decisions()
    // same batch id → watermark skip
    IncrementalSemDedup.applyBatch(spark, table, b0, 0L, nCells = 2)
    assert(decisions() == before)
    // new batch id, already-decided content → anti-joined away
    IncrementalSemDedup.applyBatch(spark, table, b0, 1L, nCells = 2)
    assert(decisions() == before)
  }
}
