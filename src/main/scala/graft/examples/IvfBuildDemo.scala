package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{CdcMerge, IncrementalAnn, IvfBuild}

/** End-to-end IVF vector-index lifecycle over the embeddings table —
  * the 100 TB ANN story run as one artifact: TRAIN (k-means‖ seeding →
  * Lloyd) → BUILD (strict capacity-balanced cells → cid-partitioned
  * serving table) → MEASURE (recall ladder vs brute force at rising
  * probe widths) → SERVE INCREMENTALLY (append a late batch against
  * the frozen centroids, delete vectors — the RTBF path — and search
  * again). nlist follows the inverted-file sizing rule ≈ √n.
  *
  * Usage: sbt "runMain graft.examples.IvfBuildDemo [sfDir]"
  */
object IvfBuildDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ivf-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table = "ivf_demo_index"
    Seq(table, s"${table}_centroids")
      .foreach(CdcMerge.dropStateTable(spark, _))
    val embs = Tables.load(spark, sfDir, "embeddings")
      .localCheckpoint()
    val n = embs.count()
    val nlist = math.max(4, math.sqrt(n.toDouble).round.toInt)

    // 1. train + build: no serving cell may exceed capacity, whatever
    // the corpus skew — the straggler guard
    val rep = IvfBuild.build(spark, table, embs, nlist = nlist,
      oversample = math.max(16, nlist), capacitySlack = 1.3)
    println(s"built $table: n=${rep.nVectors} nlist=${rep.nlist} " +
      s"capacity=${rep.capacity} maxCell=${rep.maxCell} " +
      s"cells=${rep.nCells} spilled=${rep.spilled}")
    require(rep.maxCell <= rep.capacity, "capacity contract violated")

    // 2. the recall/probe ladder — what an nProbe buys on THIS corpus
    val queries = embs.filter($"vec_id" % 100 === 7)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    Seq(1, 2, 4, 8, nlist).distinct.sorted.foreach { p =>
      val r = IvfBuild.recallAt(spark, table, embs, queries,
        nProbe = p, k = 10).head()
      println(f"nProbe=$p%3d  recall@10 = ${r.getLong(1) / 10000.0}%5.1f%%")
    }

    // 3. the built index is a LIVE IncrementalAnn index: append a
    // late batch against the frozen centroids...
    val late = embs.limit(50)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    IncrementalAnn.indexBatch(spark, table, late)
    println(s"after append: ${spark.table(table).count()} rows " +
      s"(+50 expected)")

    // ...serve a search over it...
    val hits = IncrementalAnn.searchTopK(spark, table,
      queries.limit(2), nProbe = 2, k = 5)
    println("sample search:")
    hits.orderBy($"query_id", $"rnk").show(10, truncate = false)

    // ...and erase vectors (the right-to-be-forgotten path)
    val removed = IncrementalAnn.deleteVectors(spark, table,
      late.select($"vec_id"))
    println(s"erased $removed appended vectors; " +
      s"${spark.table(table).count()} rows remain")

    Seq(table, s"${table}_centroids")
      .foreach(CdcMerge.dropStateTable(spark, _))
    spark.stop()
  }
}
