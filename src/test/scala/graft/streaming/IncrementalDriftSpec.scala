package graft.streaming

import graft.SparkSpec
import graft.operators.CurationOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IncrementalDrift: maintained histogram == one-shot emb28 report;
  * replay is a watermark no-op. */
class IncrementalDriftSpec extends SparkSpec {

  private val refT = "driftspec_ref"
  private val curT = "driftspec_hist"

  private def freshTables(): Unit =
    Seq(refT, s"${refT}_stage", s"${refT}_old",
        curT, s"${curT}_stage", s"${curT}_old")
      .foreach(CdcMerge.dropStateTable(spark, _))

  test("three disjoint batches == one-shot drift report; replay no-op") {
    import spark.implicits._
    freshTables()
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    val ref = embs.filter(pmod($"vec_id", lit(2)) === 0)
    val cur = embs.filter(pmod($"vec_id", lit(2)) === 1)
    IncrementalDrift.freezeReference(spark, refT, ref)
    def part(i: Int) = cur.filter(pmod($"vec_id", lit(6)) === 2 * i + 1)
    IncrementalDrift.applyBatch(spark, curT, part(0), 0L)
    IncrementalDrift.applyBatch(spark, curT, part(1), 1L)
    // redelivery under the original id: cells unchanged
    val before = TableSwap.readVersioned(spark, curT)
      .collect().toSet
    IncrementalDrift.applyBatch(spark, curT, part(1), 1L)
    assert(TableSwap.readVersioned(spark, curT)
      .collect().toSet == before)
    IncrementalDrift.applyBatch(spark, curT, part(2), 2L)

    val inc = IncrementalDrift.driftReport(spark, refT, curT)
      .orderBy($"dim").collect().toSeq
    val one = CurationOps.embeddingDrift(ref, cur)
      .orderBy($"dim").collect().toSeq
    assert(inc == one)
    assert(inc.nonEmpty)
    freshTables()
  }

  test("maintained cells equal the one-shot histogram exactly") {
    import spark.implicits._
    freshTables()
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    val cur = embs.filter(pmod($"vec_id", lit(2)) === 1)
    def part(i: Int) = cur.filter(pmod($"vec_id", lit(6)) === 2 * i + 1)
    (0 to 2).foreach(i =>
      IncrementalDrift.applyBatch(spark, curT, part(i), i.toLong))
    val got = TableSwap.readVersioned(spark, curT)
      .select("dim", "bin", "cnt", "vsum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = CurationOps.embeddingHistogram(cur)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    freshTables()
  }
}
