package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, SimilarityOps, SkylineOps}
import graft.sources.Tables

/** End-to-end GRAPH-AWARE curation over the embeddings + documents
  * tables — the round-11 graph surface run as one composed artifact:
  *
  *  1. BUILD the kNN graph (cell-bounded candidates, never n²);
  *  2. COMMUNITIES via deterministic synchronous LPA — the
  *     diversity-balancing unit;
  *  3. REPRESENTATIVES: PageRank centrality, then the top-ranked
  *     member PER COMMUNITY (sample by community, not by document);
  *  4. TRUST GATE: hop distance from a vetted seed set — keep only
  *     vectors within R hops of something trusted;
  *  5. PARETO GATE on the documents side: the token/type/byte
  *     skyline — what survives every monotone preference.
  *
  * Every stage is the oracle-pinned operator (emb29/40/37/41,
  * doc43); the demo is their composition, printing the funnel the
  * way a production curation run reports it.
  *
  * Usage: sbt "runMain graft.examples.GraphCurationDemo [sfDir]"
  */
object GraphCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-graph-curation-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val docs = Tables.load(spark, sfDir, "documents")
    val n = embs.count()

    // 1. the kNN graph — shared by every stage below
    val edges = SimilarityOps.knnGraph(embs)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .localCheckpoint()
    println(s"[1] kNN graph: $n vectors, ${edges.count()} edges")

    // 2. communities
    val comm = GraphOps.labelPropagation(edges, rounds = 3)
      .localCheckpoint()
    val nComm = comm.select("community").distinct().count()
    val sizes = comm.groupBy("community").agg(count(lit(1)).as("m"))
      .agg(min("m"), max("m")).collect()(0)
    println(s"[2] LPA communities: $nComm " +
      s"(sizes ${sizes.getLong(0)}..${sizes.getLong(1)})")

    // 3. PageRank representatives, one per community
    val pr = GraphOps.pageRank(edges,
      embs.select(col("vec_id").as("vid")), iters = 3)
    val repAgg = comm.join(pr, Seq("vid"))
      .groupBy("community")
      .agg(max(struct(col("pr"), col("vid"))).as("best"))
      .select(col("community"), col("best.vid").as("rep_vid"),
        col("best.pr").as("rep_pr"))
    println(s"[3] representatives: ${repAgg.count()} " +
      "(top-PageRank member per community)")

    // 4. trust gate: ≤ 2 hops from the vetted seeds
    val dist = GraphOps.hopDistance(edges,
      embs.select(col("vec_id").as("vid"),
        (col("vec_id") % 10 === 0).as("seed")), rounds = 2)
    val trusted = dist.filter(col("dist") >= 0 && col("dist") <= 2)
    println(s"[4] trust gate: ${trusted.count()} of $n vectors " +
      "within 2 hops of a seed")

    // 5. Pareto gate on the documents
    val m = docs
      .select(col("doc_id"), col("n_chars"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "n_chars")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_types"))
    val frontier = SkylineOps.skyline(m, "doc_id",
      Seq("n_tokens", "n_types"), Seq("n_chars"))
    println(s"[5] Pareto gate: ${frontier.count()} of " +
      s"${docs.count()} documents on the token/type/byte frontier")

    // the composed keep-set: community reps that pass the trust gate
    val keep = repAgg.join(trusted,
      repAgg("rep_vid") === trusted("vid"), "left_semi")
    println(s"[*] final keep-set: ${keep.count()} trusted community " +
      "representatives + the document frontier")
    spark.stop()
  }
}
