package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.DedupOps
import graft.sources.Tables

/** Dev scratch: stage-by-stage timing of the doc04 MinHash pipeline. */
object ProbeDoc04 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, sfDir, "documents")

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-22s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("scan") { noop(docs) }
    time("shingles") { noop(DedupOps.docShingles(docs)) }
    time("signature") { noop(DedupOps.minhashSignature(docs)) }
    time("bands") { noop(DedupOps.lshBands(DedupOps.minhashSignature(docs))) }
    time("candidates") {
      noop(DedupOps.lshCandidates(
        DedupOps.lshBands(DedupOps.minhashSignature(docs))))
    }
    time("full") { noop(DedupOps.verifiedNearDups(docs)) }
    spark.stop()
  }
}
