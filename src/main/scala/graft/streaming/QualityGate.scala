package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{CurationOps, SchemaDrift}

/** Streaming text-quality gate: every micro-batch of incoming
  * documents is scored with the Gopher rule battery
  * ([[CurationOps.gopherQuality]]) and SPLIT — passing docs flow to
  * the accepted table, failing docs land in a reject table WITH their
  * per-rule audit columns (which rule killed each document — the
  * evidence a filter-tuning loop needs). The ingest-side twin of the
  * schema-drift quarantine: a bad crawl batch never stops the
  * pipeline and never silently pollutes the training corpus.
  *
  * Both writes are per-batch idempotent
  * ([[SchemaDrift.writeBatchIdempotent]]: a static overwrite of the
  * batch's own `_batch_id` partition), so an at-least-once replayed
  * batch lands exactly once in EACH table. The scoring itself is
  * scan-side codegen (no shuffle) — the gate adds no wide stage to
  * ingest.
  */
object QualityGate {

  /** Split one batch of documents into (accepted, rejected-with-audit).
    * Accepted rows keep the input schema; rejected rows append the
    * rule columns. Scoring is [[CurationOps.gopherQualityKeeping]] —
    * one codegen'd projection over the batch, NO join back to the
    * input and no shuffle. */
  def split(docs: DataFrame, minTokens: Long = 50,
      maxTokens: Long = 100000): (DataFrame, DataFrame) = {
    val scored = CurationOps.gopherQualityKeeping(docs,
      minTokens = minTokens, maxTokens = maxTokens)
    val metricCols = Seq("n_tokens", "n_token_chars", "n_alpha_tokens",
      "n_stopwords", "mean_word_len", "alpha_frac")
    // NULL verdicts (NULL text → NULL metrics → NULL pass_all) route
    // to the REJECT side: a three-valued filter pair would silently
    // drop such rows from BOTH tables, breaking the gate's lossless-
    // split contract on exactly the dirty-crawl input it exists for.
    val verdict = coalesce(col("pass_all"), lit(false))
    (scored.filter(verdict).select(docs.columns.map(col): _*),
      scored.filter(!verdict)
        .drop("pass_all").drop(metricCols: _*))
  }

  /** Continuous gate: foreachBatch split + idempotent dual write. */
  def startGateStream(df: DataFrame, acceptedTable: String,
      rejectTable: String, checkpointDir: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (ok, bad) = split(batch, minTokens, maxTokens)
        SchemaDrift.writeBatchIdempotent(ok, acceptedTable, batchId)
        SchemaDrift.writeBatchIdempotent(bad, rejectTable, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
