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
}
