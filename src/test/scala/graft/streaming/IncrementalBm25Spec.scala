package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalBm25 (append-shaped postings + additive watermark
  * stats): batched fold == one-shot BM25 bit-for-bit; replay no-op and
  * crash-window idempotent (N/sum_dl advance exactly once); serves are
  * snapshot-consistent; compaction (whole-grid AND per-bucket)
  * preserves the ranking; nBuckets drift fails fast. */
class IncrementalBm25Spec extends SparkSpec {

  private val table = "bm25spec_postings"
  private val terms = Seq("spark", "merge", "window")

  private def freshTable(): Unit =
    IncrementalBm25.tables(table)
      .foreach(CdcMerge.dropStateTable(spark, _))

  // varying tf of the query terms, varying dl, docs with no hits,
  // and one empty doc (must not count toward N)
  private def docs = {
    import spark.implicits._
    ((0L until 18L).map { i =>
      val hits = (0 until (i % 4).toInt).map(_ => terms((i % 3).toInt))
      val filler = (0 until (3 + (i % 5)).toInt).map(j => s"f${i}_$j")
      (i, (hits ++ filler).mkString(" "))
    } :+ ((18L, ""))).toDF("doc_id", "text")
  }

  /** The doc19 pipeline (LlmQueries) replayed over a docs frame — the
    * one-shot this maintained view must reproduce bit-for-bit. */
  private def oneShot(d: DataFrame): Set[(Long, Long, Double)] = {
    import spark.implicits._
    val (k1, b) = (1.2, 0.75)
    val toks = d.select($"doc_id",
        explode(graft.functions.TextFunctions.tokens($"text"))
          .as("term"))
      .filter($"term" =!= "")
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum($"dl").as("sum_dl"))
    val tf = toks.filter($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        ($"n_docs".cast("double") - $"df".cast("double") + 0.5) /
          ($"df".cast("double") + 0.5))
      .withColumn("avgdl",
        $"sum_dl".cast("double") / $"n_docs".cast("double"))
      .withColumn("score",
        $"idf" * ($"tf".cast("double") * (k1 + 1.0)) /
          ($"tf".cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * $"dl".cast("double") / $"avgdl")))
    def termScore(term: String) = coalesce(
      max(when($"term" === term, $"score")), lit(0.0))
    scored.groupBy($"doc_id")
      .agg(terms.sorted.map(termScore).reduce(_ + _).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .select($"doc_id", $"n_terms_hit", $"bm25")
      .orderBy($"bm25".desc, $"doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  private def served(): Set[(Long, Long, Double)] =
    IncrementalBm25.queryView(spark, table, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("batched fold == one-shot BM25 bit-for-bit; replay no-op; " +
      "crash-window replay advances N and sum_dl exactly once") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 2).foreach(i =>
      IncrementalBm25.applyBatch(spark, table, part(i), batchId = i))
    val expected = oneShot(docs)
    assert(served() == expected && expected.nonEmpty)
    // clean replay: watermark short-circuits
    IncrementalBm25.applyBatch(spark, table, part(1), batchId = 1)
    assert(served() == expected)
    // crash-window replay: batch 2's generation is on disk but the
    // watermark was rewound to batch 1's row — the re-fold must
    // overwrite its own generation and advance the stats once
    val dl01 = part(0).unionByName(part(1))
      .select($"doc_id",
        explode(graft.functions.TextFunctions.tokens($"text"))
          .as("w"))
      .filter($"w" =!= "").groupBy($"doc_id")
      .agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)), coalesce(sum($"dl"), lit(0L))).collect()(0)
    TableSwap.writeStaged(spark,
      Seq((1L, dl01.getLong(0), dl01.getLong(1)))
        .toDF("_batch", "_n_docs", "_sum_dl"), s"${table}_wm")
    IncrementalBm25.applyBatch(spark, table, part(2), batchId = 2)
    assert(served() == expected)
  }

  test("serves are SNAPSHOT-CONSISTENT: an open crash window's " +
      "generation is invisible — df can never include a batch that " +
      "N/avgdl exclude") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    IncrementalBm25.applyBatch(spark, table, part(0), batchId = 0)
    val after0 = served()
    val wm0 = spark.table(s"${table}_wm").collect()(0)
    IncrementalBm25.applyBatch(spark, table, part(1), batchId = 1)
    val after1 = served()
    assert(after1 != after0)
    // reopen batch 1's crash window
    TableSwap.writeStaged(spark,
      Seq((wm0.getLong(0), wm0.getLong(1), wm0.getLong(2)))
        .toDF("_batch", "_n_docs", "_sum_dl"), s"${table}_wm")
    assert(served() == after0)
    IncrementalBm25.applyBatch(spark, table, part(1), batchId = 1)
    assert(served() == after1)
  }

  test("whole-grid compact AND per-bucket compactBuckets preserve " +
      "the ranking; compacted buckets drop to one partition; " +
      "post-compaction folds keep serving exactly") {
    import spark.implicits._
    freshTable()
    def part(i: Int) = docs.filter(pmod($"doc_id", lit(3)) === i)
    (0 to 1).foreach(i =>
      IncrementalBm25.applyBatch(spark, table, part(i), batchId = i,
        nBuckets = 8))
    val mid = served()
    val compacted = IncrementalBm25.compactBuckets(spark, table,
      minParts = 2)
    assert(compacted.nonEmpty)
    assert(served() == mid)
    compacted.foreach { kb =>
      val n = spark.sql(s"SHOW PARTITIONS $table").collect()
        .map(_.getString(0)).count(_.endsWith(s"_kb=$kb"))
      assert(n == 1, s"bucket $kb holds $n partitions")
    }
    // a fold after bucket compaction appends beside the compacted
    // partitions; the serve reads through the mixed layout
    IncrementalBm25.applyBatch(spark, table, part(2), batchId = 2,
      nBuckets = 8)
    val full = oneShot(docs)
    assert(served() == full)
    IncrementalBm25.compact(spark, table)
    assert(spark.table(table).select("_b").distinct().count() == 1)
    assert(served() == full)
  }

  test("nBuckets drift fails fast") {
    freshTable()
    IncrementalBm25.applyBatch(spark, table, docs, batchId = 0,
      nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      IncrementalBm25.applyBatch(spark, table, docs.limit(0),
        batchId = 1, nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets"))
  }
}
