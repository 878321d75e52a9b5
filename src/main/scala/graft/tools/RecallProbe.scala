package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.sources.Tables

/** ANN quality probe: recall@5 of each approximate path against the
  * brute-force ground truth, per query set. Recall is THE quality axis
  * approximate search trades for speed — this prints where each path
  * sits so threshold/plane/probe choices are data, not guesses.
  *
  * Usage: sbt "runMain graft.tools.RecallProbe [sfDir]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, sfDir, "embeddings")

    def neighborSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    def recall(approx: Map[Long, Set[Long]],
        truth: Map[Long, Set[Long]]): Double = {
      val per = truth.toSeq.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    // ground truth for both query ranges (k=5)
    val truthLo = neighborSets(
      SimilarityOps.bruteForceTopK(embs, nQueries = 8, k = 5))
    val truthHi = neighborSets(
      SimilarityOps.bruteForceTopK(embs, nQueries = 12, k = 5)
        .filter(col("query_id") >= 8))

    val lsh = neighborSets(SimilarityOps.lshTopK(embs, k = 5))
    val lshM4 = neighborSets(SimilarityOps.lshTopKMulti(embs, tables = 4))
    val lshM8 = neighborSets(SimilarityOps.lshTopKMulti(embs, tables = 8))
    val lshM8p4 = neighborSets(
      SimilarityOps.lshTopKMulti(embs, planes = 4, tables = 8))
    val ivf1 = neighborSets(SimilarityOps.ivfTopK(embs))
    val ivf2 = neighborSets(SimilarityOps.ivfTopKProbed(embs, nProbe = 2))
    val ivf3 = neighborSets(SimilarityOps.ivfTopKProbed(embs, nProbe = 3))
    val pqK4 = neighborSets(SimilarityOps.pqTopK(embs, k = 4))
    val pqK8 = neighborSets(SimilarityOps.pqTopK(embs, k = 8))
    val pqM16 = neighborSets(SimilarityOps.pqTopK(embs, m = 16, k = 8))
    val pqRr50 = neighborSets(SimilarityOps.pqTopKReranked(embs, k = 8))
    val pqRr200 = neighborSets(
      SimilarityOps.pqTopKReranked(embs, k = 8, candidates = 200))
    val pqRr800 = neighborSets(SimilarityOps.pqTopKReranked(
      embs, m = 16, k = 8, candidates = 800))
    val cbTrained = SimilarityOps.pqTrainCodebook(embs, k = 8, iters = 3)
    val pqTr = neighborSets(SimilarityOps.pqTopKWith(embs, cbTrained))
    val mseFirstK = SimilarityOps.pqQuantizationMse(embs,
      SimilarityOps.pqFirstKCodebook(embs, 64, 8, 8))
    val mseTrained = SimilarityOps.pqQuantizationMse(embs, cbTrained)

    println(f"RECALL lsh_6planes     ${recall(lsh, truthLo)}%.2f  (queries 0-7)")
    println(f"RECALL lsh_4tables     ${recall(lshM4, truthLo)}%.2f")
    println(f"RECALL lsh_8tables     ${recall(lshM8, truthLo)}%.2f")
    println(f"RECALL lsh_8t_4planes  ${recall(lshM8p4, truthLo)}%.2f")
    println(f"RECALL ivf_probe1      ${recall(ivf1, truthHi)}%.2f  (queries 8-11)")
    println(f"RECALL ivf_probe2      ${recall(ivf2, truthHi)}%.2f")
    println(f"RECALL ivf_probe3      ${recall(ivf3, truthHi)}%.2f")
    // PQ/ADC vs the cosine ground truth: quantization error + the
    // L2-vs-cosine metric gap both land on this one number — the
    // honest "is the compressed index good enough" readout
    println(f"RECALL pq_m8_k4        ${recall(pqK4, truthHi)}%.2f")
    println(f"RECALL pq_m8_k8        ${recall(pqK8, truthHi)}%.2f")
    println(f"RECALL pq_m16_k8       ${recall(pqM16, truthHi)}%.2f")
    println(f"RECALL pq_rerank_c50   ${recall(pqRr50, truthHi)}%.2f")
    println(f"RECALL pq_rerank_c200  ${recall(pqRr200, truthHi)}%.2f")
    println(f"RECALL pq_m16_rr_c800  ${recall(pqRr800, truthHi)}%.2f")
    println(f"RECALL pq_trained_k8   ${recall(pqTr, truthHi)}%.2f")
    println(f"PQ MSE firstk ${mseFirstK}%.4f trained ${mseTrained}%.4f")
    spark.stop()
  }
}
