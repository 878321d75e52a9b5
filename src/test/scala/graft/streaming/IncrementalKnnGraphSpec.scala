package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityOps

/** Maintained kNN graph: fold == one-shot emb29 at every prefix,
  * reverse repair pins (late vectors enter early vectors' top-k),
  * redelivery no-op, mid-stream compaction, crash-window snapshot. */
class IncrementalKnnGraphSpec extends SparkSpec {

  private val table = "knn_state"

  private def fresh(): Unit =
    IncrementalKnnGraph.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def embs: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select("vec_id", "embedding")

  // contiguous ranges: the first batch carries vec_id 0..7 — the
  // centroid-seeding contract matching the one-shot's vec_id < 8 rule
  private def part(lo: Long, hi: Long): DataFrame =
    embs.filter(col("vec_id") >= lo && col("vec_id") < hi)

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("vec_id", "nbr_id", "rnk", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

  private def oneShot(corpus: DataFrame) =
    rows(SimilarityOps.knnGraph(corpus))

  private def served = rows(IncrementalKnnGraph.graphView(spark, table))

  test("fold == one-shot emb29 at every prefix; late vectors REPAIR " +
      "early vectors' top-k; redelivery no-op; mid-stream compaction; " +
      "crash window invisible") {
    fresh()
    IncrementalKnnGraph.applyBatch(spark, table, part(0, 100), 0L)
    assert(served == oneShot(part(0, 100)),
      "prefix 0..100 diverged from the one-shot graph")
    IncrementalKnnGraph.applyBatch(spark, table, part(100, 200), 1L)
    val atPrefix2 = served
    assert(atPrefix2 == oneShot(part(0, 200)),
      "prefix 0..200 diverged from the one-shot graph")
    // REVERSE repair really happened: some early vector's neighbor
    // list now contains a batch-1 vector
    assert(atPrefix2.exists(r => r._1 < 100 && r._2 >= 100),
      "no late vector entered an early vector's top-k — the " +
        "reverse-repair path was not exercised")
    // redelivery under the committed watermark: a full no-op
    val files = spark.table(table).inputFiles.toSet
    IncrementalKnnGraph.applyBatch(spark, table, part(100, 200), 1L)
    assert(spark.table(table).inputFiles.toSet == files)
    assert(served == atPrefix2)
    // mid-stream incremental compaction: view unchanged, buckets
    // fold to one partition each
    val compacted =
      IncrementalKnnGraph.compactBuckets(spark, table, minParts = 2)
    assert(compacted.nonEmpty)
    assert(served == atPrefix2, "compaction changed the served graph")
    // last batch on top of the compacted layout
    IncrementalKnnGraph.applyBatch(spark, table, part(200, 1000000), 2L)
    assert(served == oneShot(embs),
      "full corpus diverged from the one-shot graph")
    // crash window: a generation lands, its watermark is withheld —
    // the served graph must not move (snapshot consistency); here
    // simulated by re-folding a FUTURE batch id's generation directly
    val before = served
    import spark.implicits._
    val fakeGen = Seq((0L, 999L, 0.5, 3L, 0L))
      .toDF("vec_id", "nbr_id", "cos", "_b", "_kb")
    AppendGrid.writeGeneration(spark, table, fakeGen, 3L,
      Seq("vec_id", "nbr_id", "cos"))
    assert(served == before,
      "an uncommitted generation leaked into the served graph")
    spark.sql(
      s"ALTER TABLE $table DROP IF EXISTS PARTITION (_b='3', _kb='0')")
  }

  test("neighborsOf == graphView restricted to the requested ids") {
    val ids = Seq(3L, 42L, 137L)
    val got = rows(IncrementalKnnGraph.neighborsOf(spark, table, ids))
    val expected = served.filter(r => ids.contains(r._1))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("graph parameter drift fails fast") {
    intercept[IllegalArgumentException] {
      IncrementalKnnGraph.applyBatch(spark, table, part(0, 8), 9L,
        k = 5)
    }
  }

  test("serving k above the stored k fails fast instead of silently " +
      "truncating") {
    intercept[IllegalArgumentException] {
      IncrementalKnnGraph.graphView(spark, table, k = 9)
    }
    intercept[IllegalArgumentException] {
      IncrementalKnnGraph.neighborsOf(spark, table, Seq(3L), k = 9)
    }
    // a smaller k is an exact prefix of the stored rank
    assert(rows(IncrementalKnnGraph.graphView(spark, table, k = 2)) ==
      served.filter(_._3 <= 2))
  }

  test("replay after a PARTIAL probes append restores only the " +
      "missing (vector, cell) rows") {
    // crash scenario (the r15 advice): a fold's probes append
    // partially commits — some of a vector's nProbe rows land, the
    // rest (and the watermark) do not. The replay guard must be
    // row-granular on (vec_id, cid): a vec_id-only guard would see
    // the surviving row and drop the vector whole, permanently losing
    // its missing probe cells (reverse repair then silently never
    // finds it there).
    val t2 = "knn_partial"
    IncrementalKnnGraph.tables(t2)
      .foreach(CdcMerge.dropStateTable(spark, _))
    IncrementalKnnGraph.applyBatch(spark, t2, part(0, 100), 0L)
    IncrementalKnnGraph.applyBatch(spark, t2, part(100, 200), 1L)
    val probesT = IncrementalKnnGraph.probesTable(t2)
    val full = spark.table(probesT)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pick a batch-1 vector with 2 probe rows and knock ONE out by
    // rewriting its partition without it (simulated partial commit)
    val victim = full.filter(_._1 >= 100).groupBy(_._1)
      .find(_._2.size >= 2).get._2.toSeq.sortBy(_._2).head
    val (vVec, vCid) = victim
    val stage = s"${probesT}_teststage"
    CdcMerge.dropStateTable(spark, stage)
    spark.table(probesT)
      .filter(col("cid") === vCid && !(col("vec_id") === vVec))
      .write.format("parquet").saveAsTable(stage)
    CdcMerge.withDynamicOverwrite(spark, stage, probesT) { w =>
      w.table(stage)
        .select(spark.table(probesT).columns.toSeq.map(col): _*)
        .write.mode("overwrite").insertInto(probesT)
    }
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    spark.catalog.refreshTable(probesT)
    // rewind the watermark to re-open batch 1's crash window, then
    // replay it
    import spark.implicits._
    TableSwap.writeStaged(spark, Seq(0L).toDF("_batch"),
      s"${t2}_wm")
    IncrementalKnnGraph.applyBatch(spark, t2, part(100, 200), 1L)
    spark.catalog.refreshTable(probesT)
    val after = spark.table(probesT)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == full,
      "replay did not restore the missing (vector, cell) probe row")
  }
}
