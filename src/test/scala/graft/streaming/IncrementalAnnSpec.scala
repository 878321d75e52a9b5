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

  test("deleteVectors: erased ids vanish from search; drained cell drops") {
    import spark.implicits._
    val t = "incann_del"
    Seq(t, s"${t}_centroids").foreach(CdcMerge.dropStateTable(spark, _))
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    IncrementalAnn.indexBatch(spark, t, embs)
    val total = spark.table(t).count()
    def neighborsOf(qLo: Long, qHi: Long) =
      IncrementalAnn.searchTopK(spark, t,
        embs.filter($"vec_id" >= qLo && $"vec_id" < qHi)
          .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
        nProbe = 2, k = 5)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    // erase a vector that IS currently a neighbor of some query
    val victim = neighborsOf(8, 12).head
    val removed = IncrementalAnn.deleteVectors(spark, t,
      Seq(victim).toDF("vec_id"))
    assert(removed == 1L)
    assert(!neighborsOf(8, 12).contains(victim))
    assert(spark.table(t).count() == total - 1)
    // idempotent
    assert(IncrementalAnn.deleteVectors(spark, t,
      Seq(victim).toDF("vec_id")) == 0L)
    // drain an entire cell: its partition disappears, the rest serve
    val cell = spark.table(t).select("cid").distinct()
      .collect().map(_.getLong(0)).min
    val members = spark.table(t).filter($"cid" === cell)
      .select("vec_id").collect().map(_.getLong(0))
    val removed2 = IncrementalAnn.deleteVectors(spark, t,
      members.toSeq.toDF("vec_id"))
    assert(removed2 == members.length.toLong)
    assert(spark.table(t).filter($"cid" === cell).count() == 0)
    assert(!spark.table(t).select("cid").distinct()
      .collect().map(_.getLong(0)).contains(cell))
    // re-insertion after erasure: indexBatch re-adds the victim
    IncrementalAnn.indexBatch(spark, t,
      embs.filter($"vec_id" === victim))
    assert(spark.table(t).filter($"vec_id" === victim).count() == 1)
  }

  test("blue/green retrain: new cells serve; catch-up indexes stragglers") {
    import spark.implicits._
    val (blue, green) = ("incann_blue", "incann_green")
    Seq(blue, s"${blue}_centroids", green, s"${green}_centroids")
      .foreach(CdcMerge.dropStateTable(spark, _))
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    IncrementalAnn.indexBatch(spark, blue, embs.filter($"vec_id" < 40))

    // retrain against a DIFFERENT centroid set (vectors 50-57)
    val newCents = embs.filter($"vec_id" >= 50 && $"vec_id" < 58)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    IncrementalAnn.retrainTo(spark, blue, green, newCents)
    assert(spark.table(green).count() == 40)
    val cids = spark.table(green).select("cid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((50L to 57L).toSet), s"stale cells: $cids")

    // stragglers land on blue while the rebuild runs; catch-up closes
    // the gap and is idempotent
    IncrementalAnn.indexBatch(spark, blue,
      embs.filter($"vec_id" >= 40 && $"vec_id" < 45))
    IncrementalAnn.catchUp(spark, blue, green)
    assert(spark.table(green).count() == 45)
    IncrementalAnn.catchUp(spark, blue, green)
    assert(spark.table(green).count() == 45)

    // the green pair serves searches against ITS frozen centroids
    val res = IncrementalAnn.searchTopK(spark, green,
      embs.filter($"vec_id" >= 8 && $"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
      nProbe = 2, k = 3)
    assert(res.count() > 0)
    assert(res.select("neighbor_id").distinct().count() > 0)
  }
}
