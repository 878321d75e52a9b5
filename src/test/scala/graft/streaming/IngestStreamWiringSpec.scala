package graft.streaming

import graft.SparkSpec
import graft.operators.{CurationOps, SketchOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** foreachBatch wiring of the round-10 maintained-state modules:
  * each startIngestStream over a 2-file source must land the same
  * state as the one-shot computation. */
class IngestStreamWiringSpec extends SparkSpec {

  private def drop(tables: String*): Unit =
    tables.flatMap(t => Seq(t, s"${t}_stage", s"${t}_old"))
      .foreach(CdcMerge.dropStateTable(spark, _))

  private def fileStream(df: org.apache.spark.sql.DataFrame,
      prefix: String, splitCol: String, pivot: Long) = {
    val src = tmpDir(s"$prefix-src")
    df.filter(col(splitCol) < pivot).coalesce(1)
      .write.parquet(s"$src/f1")
    df.filter(col(splitCol) >= pivot).coalesce(1)
      .write.parquet(s"$src/f2")
    spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
  }

  test("IncrementalHll stream == one-shot estimates") {
    import spark.implicits._
    val table = "wiring_hll"
    drop(table)
    val ev = Tables.load(spark, sf("sf0.001"), "events")
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val q = IncrementalHll.startIngestStream(
      fileStream(ev, "hll", "event_id", 500L), table, tmpDir("hll-ck"))
    try q.awaitTermination() finally q.stop()
    val inc = IncrementalHll.estimateByType(spark, table)
      .orderBy($"event_type").collect().toSeq
    val one = ev
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .orderBy($"event_type").collect().toSeq
    assert(inc == one && inc.nonEmpty)
    drop(table)
  }

  test("IncrementalKmv stream == one-shot sketches") {
    import spark.implicits._
    val table = "wiring_kmv"
    drop(table)
    val ev = Tables.load(spark, sf("sf0.001"), "events")
      .select($"event_id", $"user_id", $"event_type")
    val q = IncrementalKmv.startIngestStream(
      fileStream(ev, "kmv", "event_id", 500L), table, "event_type",
      "user_id", tmpDir("kmv-ck"), k = 16)
    try q.awaitTermination() finally q.stop()
    val got = IncrementalKmv.readSketches(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = ev.select($"event_type").distinct().collect()
      .map(_.getString(0)).flatMap { g =>
        SketchOps.kmvSketch(ev.filter($"event_type" === g),
          "user_id", 16).collect().map(r => (g, r.getLong(0)))
      }.toSet
    assert(got == want && got.nonEmpty)
    drop(table)
  }

  test("IncrementalCms stream == one-shot grid") {
    import spark.implicits._
    val table = "wiring_cms"
    drop(table)
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val words = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("word"))
      .filter(length($"word") > 0)
    val q = IncrementalCms.startIngestStream(
      fileStream(words, "cms", "doc_id", 25L), table, "word",
      tmpDir("cms-ck"))
    try q.awaitTermination() finally q.stop()
    val got = IncrementalCms.readGrid(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SketchOps.cmsGrid(words, "word").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
    drop(table)
  }

  test("IncrementalSpans stream == one-shot span report") {
    import spark.implicits._
    val table = "wiring_spans"
    IncrementalSpans.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val q = IncrementalSpans.startIngestStream(
      fileStream(docs, "spans", "doc_id", 25L), table,
      tmpDir("spans-ck"))
    try q.awaitTermination() finally q.stop()
    val inc = IncrementalSpans.spanReport(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val one = graft.operators.DedupOps.repeatedSpans(docs, 8)
      .groupBy("span_key")
      .agg(max("n_docs").as("n_docs"), max("n_occ").as("n_occ"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == one && inc.nonEmpty)
    IncrementalSpans.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("IncrementalSample stream == one-shot bottom-k") {
    import spark.implicits._
    val table = "wiring_sample"
    IncrementalSample.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val q = IncrementalSample.startIngestStream(
      fileStream(docs, "sample", "doc_id", 25L), table,
      tmpDir("sample-ck"), k = 8)
    try q.awaitTermination() finally q.stop()
    val inc = IncrementalSample.sample(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = CurationOps.prioritySample(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == one && inc.size == 8)
    IncrementalSample.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("IncrementalDocFreq stream == one-shot rarity keywords") {
    import spark.implicits._
    val table = "wiring_df"
    IncrementalDocFreq.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val q = IncrementalDocFreq.startIngestStream(
      fileStream(docs, "df", "doc_id", 25L), table, tmpDir("df-ck"))
    try q.awaitTermination() finally q.stop()
    assert(IncrementalDocFreq.nDocs(spark, table) == docs.count())
    val inc = IncrementalDocFreq.keywordView(spark, table, docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val one = CurationOps.rarityKeywords(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(inc == one && inc.nonEmpty)
    IncrementalDocFreq.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("IncrementalDrift stream == one-shot report") {
    import spark.implicits._
    val refT = "wiring_drift_ref"; val curT = "wiring_drift_cur"
    drop(refT, curT)
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
    val ref = embs.filter(pmod($"vec_id", lit(2)) === 0)
    val cur = embs.filter(pmod($"vec_id", lit(2)) === 1)
    IncrementalDrift.freezeReference(spark, refT, ref)
    val q = IncrementalDrift.startIngestStream(
      fileStream(cur, "drift", "vec_id", 500L), curT,
      tmpDir("drift-ck"))
    try q.awaitTermination() finally q.stop()
    val inc = IncrementalDrift.driftReport(spark, refT, curT)
      .orderBy($"dim").collect().toSeq
    val one = CurationOps.embeddingDrift(ref, cur)
      .orderBy($"dim").collect().toSeq
    assert(inc == one && inc.nonEmpty)
    drop(refT, curT)
  }

  test("IncrementalKnnGraph stream == one-shot emb29 graph") {
    import spark.implicits._
    val table = "wiring_knn"
    IncrementalKnnGraph.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
      .select($"vec_id", $"embedding")
    // the FIRST micro-batch must carry the centroid seeds (vec 0..7),
    // so the two source files need strictly ordered mtimes — the
    // source picks older files first and batch order is semantic here
    val src = tmpDir("knn-src")
    embs.filter($"vec_id" < 250L).coalesce(1).write.parquet(s"$src/f1")
    Thread.sleep(1100)
    embs.filter($"vec_id" >= 250L).coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src)
    val q = IncrementalKnnGraph.startIngestStream(stream, table,
      tmpDir("knn-ck"), nBuckets = 8)
    try q.awaitTermination() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "nbr_id", "rnk", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val inc = rows(IncrementalKnnGraph.graphView(spark, table))
    val one = rows(graft.operators.SimilarityOps.knnGraph(embs))
    assert(inc == one && inc.nonEmpty)
    IncrementalKnnGraph.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }

  test("IncrementalMediaDedup stream == one-shot mm06 pairs") {
    import spark.implicits._
    val table = "wiring_mdd"
    IncrementalMediaDedup.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
    val media = graft.operators.MultimodalOps.toMediaColumns(
      Tables.load(spark, sf("sf0.001"), "documents")
        .select($"doc_id", $"text", $"source"))
    val q = IncrementalMediaDedup.startIngestStream(
      fileStream(media, "mdd", "doc_id", 250L), table,
      tmpDir("mdd-ck"))
    try q.awaitTermination() finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = pairs(IncrementalMediaDedup.report(spark, table))
    val one = pairs(graft.operators.MultimodalOps.mediaNearDups(media))
    assert(inc == one && inc.nonEmpty)
    IncrementalMediaDedup.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))
  }
}
