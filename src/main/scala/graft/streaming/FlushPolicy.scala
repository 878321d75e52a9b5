package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** O11 — flush policy: "flush when the buffer reaches `batchSize` OR
  * `flushIntervalSec` elapsed, whichever first" (reference
  * `stream_cdc/processing/coordinator.py:26-59`; defaults
  * `config/loader.py:29-30`).
  *
  * On Spark the policy maps onto the trigger machinery: the time half is
  * `Trigger.ProcessingTime`, the size half is a source rate cap
  * (`maxFilesPerTrigger` for file sources / `maxOffsetsPerTrigger` for
  * offset sources) — same delivery guarantee: at-least-once with bounded
  * batch size and bounded latency (SURVEY.md O11).
  *
  * `shouldFlush` is kept as a pure function for behavioral-parity tests.
  */
final case class FlushPolicy(batchSize: Int = 10,
    flushIntervalSec: Double = 5.0) {
  require(batchSize > 0, "batch_size must be positive")
  require(flushIntervalSec > 0, "flush_interval must be positive")

  /** Exact reference semantics (`coordinator.py:40-55`). */
  def shouldFlush(bufferSize: Int, lastFlushMs: Long, nowMs: Long): Boolean =
    bufferSize >= batchSize ||
      (nowMs - lastFlushMs) >= (flushIntervalSec * 1000).toLong

  def trigger: Trigger =
    Trigger.ProcessingTime((flushIntervalSec * 1000).toLong)

  /** Source rate-cap options implementing the size half. */
  def sourceOptions: Map[String, String] =
    Map("maxFilesPerTrigger" -> batchSize.toString)
}
