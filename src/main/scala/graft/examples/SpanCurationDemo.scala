package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, DedupOps}
import graft.sources.Tables

/** End-to-end SPAN-LEVEL curation over the documents table — the
  * round-12 text surface run as one composed artifact:
  *
  *  1. DETECT exact repeated spans (Lee et al. exact-substring dedup
  *     at token grain — the memorization killer doc-level dedup
  *     cannot express);
  *  2. COVERAGE: merge each doc's repeated spans into islands and
  *     score what fraction of the doc is boilerplate;
  *  3. GATE: drop template instances (coverage above the threshold);
  *  4. SCORE survivors against the cross-validated held-out bigram
  *     LM (no doc's tokens in its own scoring model) and keep the
  *     fluent band;
  *  5. SELECT the training subset by deterministic weighted priority
  *     sampling (weight = token count), tagged with rarity keywords.
  *
  * Every stage is the oracle-pinned operator (doc46/47/45/48/49);
  * the demo is their composition, printing the funnel the way a
  * production curation run reports it.
  *
  * Usage: sbt "runMain graft.examples.SpanCurationDemo [sfDir]"
  */
object SpanCurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-span-curation-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").localCheckpoint()
    val nDocs = docs.count()

    // 1. exact repeated spans (8-token windows in >= 2 docs)
    val spans = DedupOps.repeatedSpans(docs, spanLen = 8)
    val nOcc = spans.count()
    val nKeys = spans.select("span_key").distinct().count()
    println(s"[1] repeated spans: $nKeys distinct spans, " +
      s"$nOcc occurrences across $nDocs docs")

    // 2. per-doc boilerplate coverage
    val coverage = DedupOps.spanCoverage(docs, spanLen = 8)
      .localCheckpoint()
    val covStats = coverage.agg(
      sum((col("coverage_ppm") > 0).cast("long")),
      max("coverage_ppm")).collect()(0)
    println(s"[2] coverage: ${covStats.getLong(0)} docs carry " +
      s"repeated spans (max ${covStats.getLong(1)} ppm)")

    // 3. template gate: keep docs under 50% boilerplate
    val kept = docs.join(
      coverage.filter(col("coverage_ppm") <= 500000)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    println(s"[3] template gate (<= 500000 ppm): " +
      s"${kept.count()} of $nDocs docs survive")

    // 4. CV held-out LM fluency band on the survivors
    val scored = CurationOps.bigramLmScoreCv(kept, folds = 8)
    val band = scored.filter(col("n_bigrams") > 0 &&
      col("avg_ppm") >= 1000)
    val fluent = kept.join(band.select("doc_id"), Seq("doc_id"),
      "left_semi").localCheckpoint()
    println(s"[4] CV-LM fluency band (avg >= 1000 ppm): " +
      s"${fluent.count()} docs")

    // 5. weighted priority sample + keywords for the selected set
    val sample = CurationOps.prioritySample(fluent, k = 16)
    val tagged = sample.join(
      CurationOps.rarityKeywords(fluent, m = 2)
        .filter(col("rnk") === 1)
        .select(col("doc_id"), col("word").as("top_keyword")),
      Seq("doc_id"), "left_outer")
    println("[5] priority sample (16 docs, weight = tokens):")
    tagged.orderBy("priority").collect().foreach { r =>
      println(f"    doc ${r.getLong(0)}%6d  w=${r.getLong(1)}%4d  " +
        f"priority=${r.getLong(2)}%12d  keyword=${r.getString(3)}")
    }

    spark.stop()
  }
}
