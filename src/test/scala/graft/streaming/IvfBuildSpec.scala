package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** End-to-end IVF build pipeline: trained codebook geometry, the
  * capacity contract on every cell, serving-path equivalence, and the
  * recall ladder (monotone in nProbe, exact at full probe). */
class IvfBuildSpec extends SparkSpec {

  private lazy val embs =
    Tables.load(spark, sf("sf0.001"), "embeddings")

  test("build: capacity bound holds on every cell; index is total") {
    val t = "ivfbuild_idx"
    Seq(t, s"${t}_centroids").foreach(CdcMerge.dropStateTable(spark, _))
    val rep = IvfBuild.build(spark, t, embs, nlist = 16,
      oversample = 8, capacitySlack = 1.2)
    val n = embs.count()
    assert(rep.nVectors == n)
    // every vector indexed exactly once
    assert(spark.table(t).count() == n)
    assert(spark.table(t).select("vec_id").distinct().count() == n)
    // the contract: no cell exceeds capacity — on ANY corpus
    assert(rep.maxCell <= rep.capacity,
      s"cell over capacity: $rep")
    assert(rep.nCells >= 2 && rep.nCells <= 16)
    // frozen codebook is nlist-sized and normed
    assert(spark.table(s"${t}_centroids").count() == 16)
  }

  test("search over built index: recall monotone in nProbe, exact " +
      "at full probe; appends keep serving") {
    import spark.implicits._
    val t = "ivfbuild_ladder"
    Seq(t, s"${t}_centroids").foreach(CdcMerge.dropStateTable(spark, _))
    val rep = IvfBuild.build(spark, t, embs, nlist = 16,
      oversample = 8, capacitySlack = 1.2)
    assert(rep.maxCell <= rep.capacity)
    val queries = embs.filter($"vec_id" % 100 === 7)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val ladder = Seq(1, 2, 4, 8, 16).map { p =>
      val r = IvfBuild.recallAt(spark, t, embs, queries,
        nProbe = p, k = 5).head()
      (r.getInt(0), r.getLong(1))
    }
    // recall is monotone nondecreasing in probe width (each wider
    // probe scans a superset of cells)...
    ladder.sliding(2).foreach {
      case Seq((pa, ra), (pb, rb)) =>
        assert(rb >= ra, s"recall fell $pa->$pb: $ladder")
      case _ =>
    }
    // ...and probing EVERY cell removes the approximation entirely:
    // the capacity bound relocates vectors, it never loses them
    assert(ladder.last._2 == 1000000L, s"full probe not exact: $ladder")
    // narrow probes genuinely approximate on this corpus (the ladder
    // is a real trade, not flat)
    assert(ladder.head._2 < 1000000L)

    // the built index is a live IncrementalAnn index: a later batch
    // appends against the frozen centroids and becomes searchable
    val extra = embs.select(($"vec_id" + 10000).as("vec_id"),
      $"embedding")
    IncrementalAnn.indexBatch(spark, t, extra.limit(5))
    assert(spark.table(t).count() == rep.nVectors + 5)
  }

  test("explicit centroids skip training; degenerate args rejected") {
    import spark.implicits._
    val t = "ivfbuild_explicit"
    Seq(t, s"${t}_centroids").foreach(CdcMerge.dropStateTable(spark, _))
    // hand the builder a fixed 4-centroid codebook: the pipeline is
    // then assignment + write only, and the stored codebook is the
    // one supplied
    val cents = embs.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
      .localCheckpoint()
    val rep = IvfBuild.build(spark, t, embs, nlist = 4,
      capacitySlack = 1.5, centroids = Some(cents))
    assert(rep.maxCell <= rep.capacity)
    assert(spark.table(s"${t}_centroids").count() == 4)
    intercept[IllegalArgumentException] {
      IvfBuild.build(spark, "ivfbuild_bad", embs, nlist = 1)
    }
    intercept[IllegalArgumentException] {
      IvfBuild.build(spark, "ivfbuild_bad", embs, nlist = 4,
        capacitySlack = 0.5)
    }
  }
}
