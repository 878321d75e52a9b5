package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, DedupOps}
import graft.sources.Tables

/** End-to-end SPAN-LEVEL curation over the documents table — the
  * round-12/13 text surface run as one composed artifact:
  *
  *  1. DETECT exact repeated spans (Lee et al. exact-substring dedup
  *     at token grain — the memorization killer doc-level dedup
  *     cannot express);
  *  2. COVERAGE: merge each doc's repeated spans into islands and
  *     score what fraction of the doc is boilerplate;
  *  3. GATE: drop template instances (coverage above the threshold);
  *  4. REMOVE the surviving docs' residual repeated spans (the final
  *     Lee et al. step — the text that actually ships to training);
  *  5. SCORE survivors against the cross-validated held-out bigram
  *     LM (no doc's tokens in its own scoring model) and keep the
  *     fluent band;
  *  6. SELECT the training subset by deterministic weighted priority
  *     sampling (weight = token count), tagged with rarity keywords.
  *
  * Every stage is the oracle-pinned operator
  * (doc46/47/50/45/48/49);
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

    // 3. template gate: drop only PURE template instances (100%
    // boilerplate — nothing unique to salvage); partial templates
    // survive and have their boilerplate CUT in stage 4 instead of
    // losing their unique tail with the doc
    val kept = docs.join(
      coverage.filter(col("coverage_ppm") < 1000000)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    println(s"[3] template gate (< 1000000 ppm): " +
      s"${kept.count()} of $nDocs docs survive")

    // 4. cut the survivors' repeated spans — detected on the FULL
    // corpus in stage 1 (Lee et al. semantics: a span repeated
    // against a dropped template is still boilerplate), cut only
    // from the docs that ship
    val deduped = DedupOps.cutSpans(kept,
        spans.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("pos")),
        spanLen = 8)
      .select(col("doc_id"), col("text_deduped").as("text"),
        col("n_tok_removed"))
      .localCheckpoint()
    val cutStats = deduped.agg(sum("n_tok_removed"),
      sum((col("n_tok_removed") > 0).cast("long"))).collect()(0)
    println(s"[4] span removal: ${cutStats.getLong(0)} tokens cut " +
      s"from ${cutStats.getLong(1)} docs")

    // 5. CV held-out LM fluency band on the deduped text
    val scored = CurationOps.bigramLmScoreCv(
      deduped.filter(length(trim(col("text"))) > 0), folds = 8)
    val band = scored.filter(col("n_bigrams") > 0 &&
      col("avg_ppm") >= 1000)
    val fluent = deduped.join(band.select("doc_id"), Seq("doc_id"),
      "left_semi").localCheckpoint()
    println(s"[5] CV-LM fluency band (avg >= 1000 ppm): " +
      s"${fluent.count()} docs")

    // 6. weighted priority sample + keywords for the selected set
    val sample = CurationOps.prioritySample(fluent, k = 16)
    val tagged = sample.join(
      CurationOps.rarityKeywords(fluent, m = 2)
        .filter(col("rnk") === 1)
        .select(col("doc_id"), col("word").as("top_keyword")),
      Seq("doc_id"), "left_outer")
    println("[6] priority sample (16 docs, weight = tokens):")
    tagged.orderBy("priority").collect().foreach { r =>
      println(f"    doc ${r.getLong(0)}%6d  w=${r.getLong(1)}%4d  " +
        f"priority=${r.getLong(2)}%12d  keyword=${r.getString(3)}")
    }

    spark.stop()
  }
}
