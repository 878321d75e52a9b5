package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Incrementally-maintained DOCUMENT-FREQUENCY table — the corpus
  * statistic behind doc49's rarity-weighted keywords
  * ([[graft.operators.CurationOps.rarityKeywords]]) kept current
  * under document ingest, so NEW documents can be keyword-tagged
  * against the WHOLE corpus's df without rescanning it: the serving
  * pattern of a tagging/routing stage in a streaming curation
  * pipeline (what is this incoming document about, rare-term-wise?).
  *
  * State: the (word, df) table as PER-BATCH DELTAS — df is ADDITIVE
  * under the document-disjoint contract (each batch contributes the
  * count of ITS docs containing the word), so the fold is the
  * additive-camp APPEND pattern, not a merge: word keys are
  * Zipf-distributed and every realistic batch contains the common
  * words, so a merge-shaped bucketed table would touch every bucket
  * per fold (the cdc40 finding, in vocabulary clothing). Each fold
  * appends its (word, df_delta) rows into its own `_b` generation
  * (dynamic overwrite → idempotent through the crash window, write ∝
  * batch vocabulary); read-side df = SUM(df_delta) per word; the
  * 1-row watermark carries the additive corpus doc count N (updated
  * exactly once per batch — a crash between grid write and watermark
  * write replays into the same generation against the old N);
  * [[compact]] folds generations on cadence. State cardinality is the
  * corpus VOCABULARY — sublinear in corpus size (heaps' law), far
  * below the spans grid.
  *
  * Contract: document-disjoint append-only batches with monotonically
  * increasing batch ids; a doc re-arriving with changed text is out
  * of contract (its old words' counts would persist). */
object IncrementalDocFreq {

  private def wmTable(table: String) = s"${table}_wm"

  /** All tables the df state maintains — for test/registration
    * cleanup. */
  def tables(table: String): Seq[String] =
    Seq(table, s"${table}_compacting", s"${table}_old",
      wmTable(table), s"${wmTable(table)}_stage",
      s"${wmTable(table)}_old")

  /** The committed (batch id, corpus doc count) — (-1, 0) before the
    * first watermark write. Serve paths filter the grid to `_b <=`
    * the committed batch AND take N from the SAME row: between a
    * fold's grid write and its watermark write (the crash window),
    * reading the fresh generation against the old N would transiently
    * skew score = tf·(N·10⁶ div df) — df including a batch N excludes
    * (the r13 finding). Snapshot-consistent reads see exactly the
    * pre-batch state until the watermark lands. */
  private def committed(spark: SparkSession,
      table: String): (Long, Long) = {
    val wm = wmTable(table)
    TableSwap.recover(spark, wm, s"${wm}_stage")
    if (!spark.catalog.tableExists(wm)) (-1L, 0L)
    else {
      // the max-_batch row WHOLE (struct max): append-committed
      // watermarks hold history rows — N must ride the same row as
      // the batch fence
      val row = spark.table(wm)
        .agg(max(struct(col("_batch"), col("_n_docs"))).as("_w"))
        .collect()(0)
      if (row.isNullAt(0)) (-1L, 0L)
      else {
        val w = row.getStruct(0)
        (w.getLong(0), w.getLong(1))
      }
    }
  }

  private def batchTf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))

  /** Fold one document batch: one tokenization + one map-side
    * aggregate (∝ batch tokens) + one append-shaped write (∝ batch
    * vocabulary). `nBuckets` is fixed for the table's lifetime. */
  def applyBatch(spark: SparkSession, table: String,
      batchDocs: DataFrame, batchId: Long, nBuckets: Int = 32): Unit =
    FoldTimer.timed {
      AppendGrid.recover(spark, table)
      val (lastBatch, nSoFar) = committed(spark, table)
      if (batchId <= lastBatch) return
      val nBatch = batchDocs.count()
      val deltas = batchTf(batchDocs)
        .groupBy("word").agg(count(lit(1)).as("df_delta"))
        .withColumn("_b", lit(batchId))
        .withColumn("_kb",
          pmod(xxhash64(col("word")), lit(nBuckets.toLong)))
        .select(col("word"), col("df_delta"), col("_b"), col("_kb"))
      if (!spark.catalog.tableExists(table)) {
        CdcMerge.dropStateTable(spark, table)
        deltas.repartition(col("_kb"))
          .write.mode("overwrite").format("parquet")
          .partitionBy("_b", "_kb").saveAsTable(table)
        CdcMerge.setNBuckets(spark, table, nBuckets)
      } else {
        CdcMerge.requireNBuckets(spark, table, nBuckets)
        // static-prefix overwrite of the batch's own generation only
        // (conf-independent — see AppendGrid.writeGeneration)
        AppendGrid.writeGeneration(spark, table, deltas, batchId,
          Seq("word", "df_delta"))
      }
      import spark.implicits._
      // monotone watermark row carrying the additive corpus doc count
      // N: append-commit; the reader takes the max-_batch row WHOLE
      // (struct max) so N always rides the same committed batch. N
      // updates exactly once per batch (a crash-window replay still
      // reads the OLD N here, because this write is what advances it).
      TableSwap.appendCommit(spark,
        Seq((batchId, nSoFar + nBatch)).toDF("_batch", "_n_docs"),
        wmTable(table))
    }

  /** The maintained (word, df) statistic: SUM of the per-batch deltas
    * — one map-side-combined aggregate over the vocabulary-sized
    * grid. Snapshot-consistent: generations above the committed
    * watermark (an open crash window) are invisible. */
  def dfReport(spark: SparkSession, table: String): DataFrame = {
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    AppendGrid.resolved(spark, table)
      .filter(col("_b") <= committed(spark, table)._1)
      .groupBy("word")
      .agg(sum(col("df_delta")).as("df"))
  }

  /** The maintained corpus doc count N (committed batches only). */
  def nDocs(spark: SparkSession, table: String): Long =
    committed(spark, table)._2

  /** MAINTAINED RARITY-KEYWORD VIEW — doc49 served from the
    * maintained statistics: the REQUESTED docs keyword-tagged with
    * tf · ((N·10⁶) div df) against the WHOLE ingested corpus's df and
    * N. This is what a per-batch one-shot gets wrong: a batch-local
    * df calls every batch-rare word a keyword; the maintained df
    * knows which words are corpus-common. Requesting the full corpus
    * reproduces [[graft.operators.CurationOps.rarityKeywords]] over
    * it exactly (cdc43 pins that equality through the doc49 oracle).
    *
    * Cost shape: the grid is RESTRICTED to the requested docs' words
    * before the df aggregate (broadcast semi-join at shard-sized
    * requests — the cdc41 serving trick), so the vocabulary table is
    * scanned but only matching rows shuffle; tf and the top-m window
    * are ∝ the requested docs.
    *
    * Words the table has never seen score NOTHING (inner join): the
    * view tags against the INGESTED corpus's statistics, so fold a
    * batch before tagging it (the cdc43 harness shape) — tagging
    * un-ingested text would otherwise silently skip its novel
    * words. */
  def keywordView(spark: SparkSession, table: String,
      docs: DataFrame, m: Int = 3): DataFrame = {
    require(m >= 1)
    AppendGrid.recover(spark, table)
    spark.catalog.refreshTable(table)
    val tf = batchTf(docs)
    val reqWords = tf.select("word").distinct()
    // df and N from ONE committed watermark read: the crash-window
    // skew (df including a batch that N excludes) is closed by
    // filtering the grid to the same snapshot the N came from
    val (wmB, n) = committed(spark, table)
    val df = AppendGrid.resolved(spark, table)
      .filter(col("_b") <= wmB)
      .join(reqWords, Seq("word"), "left_semi")
      .groupBy("word").agg(sum(col("df_delta")).as("df"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(df, Seq("word"))
      .withColumn("score",
        col("tf") * expr(s"(${n}L * 1000000L) div df"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= m)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  /** Fold all `_b` generations into the newest one — one file per
    * bucket again, with the deltas SUMMED per word so the compacted
    * generation is the vocabulary itself. Shares
    * [[AppendGrid.compact]]: staged rewrite + crash-recoverable
    * rename chain, graft.* properties carried, FENCED on the batch
    * watermark (an open crash window refuses to compact — its replay
    * would overwrite the compacted generation). Single-writer: pause
    * the ingest stream. */
  def compact(spark: SparkSession, table: String): Unit = {
    AppendGrid.compact(spark, table, (grid, maxB) =>
      grid.groupBy("word", "_kb")
        .agg(sum(col("df_delta")).as("df_delta"))
        .withColumn("_b", lit(maxB))
        .select(col("word"), col("df_delta"), col("_b"), col("_kb")),
      sortCols = Seq("word"))
    ()
  }

  /** INCREMENTAL compaction ([[AppendGrid.compactBuckets]]): fold only
    * the buckets with ≥ `minParts` live generations — deltas SUMMED
    * per word like [[compact]], cost ∝ fragmented buckets, no table
    * rename, untouched buckets byte-identical. The natural cadence
    * service for this grid: word keys are Zipf-distributed, so every
    * fold appends to every bucket and all buckets fragment at the same
    * rate — but each bucket's rewrite is ∝ that bucket's vocabulary
    * slice, never the whole table, and the whole-grid rename window
    * disappears. */
  def compactBuckets(spark: SparkSession, table: String,
      minParts: Int = 4): Seq[Long] =
    AppendGrid.compactBuckets(spark, table, (live, fence) =>
      live.groupBy("word", "_kb")
        .agg(sum(col("df_delta")).as("df_delta"))
        .withColumn("_b", lit(fence))
        .select(col("word"), col("df_delta"), col("_b"), col("_kb")),
      dataCols = Seq("word", "df_delta"),
      sortCols = Seq("word"), minParts = minParts)

  /** Continuous maintenance: foreachBatch [[applyBatch]] under the
    * stream's own monotone batch ids. */
  def startIngestStream(df: DataFrame, table: String,
      checkpointDir: String, nBuckets: Int = 32,
      availableNow: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId,
          nBuckets)
      }
    (if (availableNow)
       writer.trigger(
         org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
