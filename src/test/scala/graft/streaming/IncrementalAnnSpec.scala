package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Incremental IVF index: batch-wise build equals the one-shot
  * multi-probe search; replayed batches append nothing; appends touch
  * only their cells' partitions. */
class IncrementalAnnSpec extends SparkSpec {

  test("batched index search equals one-shot ivfTopKProbed; replay inert") {
    import spark.implicits._
    val t = "incann_idx"
    Seq(t, s"${t}_centroids")
      .foreach(CdcMerge.dropStateTable(spark, _))
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    val batches = Seq(
      embs.filter($"vec_id" < 20),
      embs.filter($"vec_id" >= 20 && $"vec_id" < 35),
      embs.filter($"vec_id" >= 20 && $"vec_id" < 35), // replay
      embs.filter($"vec_id" >= 35))
    batches.foreach(b => IncrementalAnn.indexBatch(spark, t, b))
    // replay appended nothing: one row per vector
    assert(spark.table(t).count() == embs.count())

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rnk", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val got = rows(IncrementalAnn.searchTopK(spark, t,
      embs.filter($"vec_id" >= 8 && $"vec_id" < 12)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
      nProbe = 2, k = 5))
    val oneShot = rows(SimilarityOps.ivfTopKProbed(embs, nProbe = 2))
    assert(got == oneShot, s"incremental != one-shot")
    assert(got.nonEmpty)

    // the index is cid-partitioned: searching 2 cells reads a strict
    // subset of partition directories
    val cids = spark.table(t).select("cid").distinct().count()
    assert(cids > 1, "degenerate single-cell index")
  }
}
