package graft.streaming

import java.nio.charset.StandardCharsets

/** Size-aware sink batching with claim-check fallback and split-retry —
  * the reference's SQS packing logic (O12-O15) as pure, executor-side
  * Scala. No Catalyst analog by design (SURVEY.md §4.3): this runs inside
  * `foreachBatch`/`foreachPartition`, once per executor partition, so it
  * scales horizontally with the sink fan-out.
  *
  * Limits mirror reference `stream_cdc/streams/sqs.py:22-29`; greedy
  * packing `sqs.py:149-203`; claim-check stub `sqs.py:250-302`;
  * split-retry `sqs.py:360-373`; partial-failure policy `sqs.py:304-358`.
  */
object BatchPacker {

  /** Max entries per batch request (reference `sqs.py:23`). */
  val MaxBatchMessages = 10
  /** Max bytes per batch request (reference `sqs.py:25`). */
  val MaxBatchBytes: Long = 262000L
  /** Effective per-message limit with metadata headroom
    * (reference `sqs.py:29`). */
  val MaxMessageBytes: Long = 245760L

  /** Default message-source attribute (reference `sqs.py:80`:
    * `source or os.getenv("SOURCE") or "stream_cdc"`). */
  val DefaultSource = "stream_cdc"

  /** Sink entry. `source` mirrors the reference's per-message
    * `MessageAttributes: {source}` (`sqs.py:225-231`, and on
    * claim-check stubs `sqs.py:283`): provenance rides OUTSIDE the
    * body so consumers can route/filter without parsing payloads. */
  final case class Entry(id: String, body: String, oversized: Boolean,
      source: String = DefaultSource) {
    def byteSize: Long = body.getBytes(StandardCharsets.UTF_8).length.toLong
  }

  /** Failure codes the transport considers transient (reference
    * `sqs.py:331-335`). */
  val RetriableCodes: Set[String] =
    Set("InternalError", "ServiceUnavailable", "ThrottlingException")

  /** Per-entry send failure (reference `sqs.py:304-358`). `senderFault`
    * is the transport's own attribution (SQS `SenderFault`): a failure
    * the RECEIVER caused is always worth retrying; a sender-fault one
    * only when its code is in the transient taxonomy. */
  final case class EntryFailure(id: String, code: String,
      senderFault: Boolean) {
    def retriable: Boolean = !senderFault || RetriableCodes(code)
  }

  /** Batch-level retry decision (reference `sqs.py:336-341`): retry
    * when ANY failure is retriable. */
  def shouldRetry(failures: Seq[EntryFailure]): Boolean =
    failures.exists(_.retriable)

  final case class SendResult(failures: Seq[EntryFailure]) {
    def allFailed(batch: Seq[Entry]): Boolean =
      batch.nonEmpty && failures.size == batch.size
  }
  object SendResult { val ok: SendResult = SendResult(Nil) }

  /** Raised by clients whose transport rejects a whole batch for size
    * (the `BatchRequestTooLong` analogue, reference `sqs.py:360-366`). */
  final class BatchTooLongException(msg: String) extends RuntimeException(msg)
  /** Raised when every entry of a batch failed (reference `sqs.py:352-358`). */
  final class AllEntriesFailedException(msg: String)
    extends RuntimeException(msg)

  /** Claim-check stub for an oversized message (reference
    * `sqs.py:263-287`): a small reference envelope carrying the locator
    * fields that happen to be present, with a minimal double-fallback
    * (`sqs.py:289-297`) when even stub construction has nothing to copy.
    */
  def claimCheckStub(id: String, fields: Map[String, String]): String = {
    val wanted = Seq("event_type", "database", "table", "id")
    val carried = wanted.flatMap(k => fields.get(k).map(v =>
      s""""$k":${jsonStr(v)}"""))
    val base = Seq(
      """"original_size_exceeded":true""",
      """"message_type":"reference"""",
      s""""message_id":${jsonStr(id)}""")
    (base ++ carried).mkString("{", ",", "}")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Prepare one message (reference `sqs.py:205-234`): oversized bodies
    * are replaced by the claim-check stub and flagged. */
  def prepare(id: String, body: String,
      stubFields: Map[String, String] = Map.empty,
      source: String = DefaultSource): Entry = {
    val size = body.getBytes(StandardCharsets.UTF_8).length.toLong
    if (size > MaxMessageBytes)
      Entry(id, claimCheckStub(id, stubFields), oversized = true, source)
    else Entry(id, body, oversized = false, source)
  }

  /** Greedy size-aware packing (reference `sqs.py:169-203`): consecutive
    * entries are packed while the batch stays ≤ [[MaxBatchMessages]]
    * entries AND ≤ [[MaxBatchBytes]] bytes.
    *
    * Iterator-in, iterator-out: a 10M-row partition never materializes —
    * the packer holds at most one batch in memory. This is the property
    * that lets the sink path run at 100 TB.
    */
  def pack(entries: Iterator[Entry]): Iterator[Seq[Entry]] =
    new Iterator[Seq[Entry]] {
      private val it = entries.buffered
      def hasNext: Boolean = it.hasNext
      def next(): Seq[Entry] = {
        val batch = Vector.newBuilder[Entry]
        var n = 0
        var bytes = 0L
        var full = false
        while (!full && it.hasNext) {
          val sz = it.head.byteSize
          if (n == 0 || (n < MaxBatchMessages && bytes + sz <= MaxBatchBytes)) {
            batch += it.next(); n += 1; bytes += sz
          } else full = true
        }
        batch.result()
      }
    }

  /** Send one batch with recursive halving on size rejection (reference
    * `sqs.py:360-373`) and the reference's partial-failure policy: raise
    * only if every entry in the batch failed (`sqs.py:352-358`). Returns
    * all per-entry failures for the caller to log/retry.
    */
  def sendWithSplitRetry(batch: Seq[Entry],
      send: Seq[Entry] => SendResult): Seq[EntryFailure] = {
    if (batch.isEmpty) return Nil
    try {
      val res = send(batch)
      if (res.allFailed(batch))
        throw new AllEntriesFailedException(
          s"all ${batch.size} entries failed: ${res.failures.take(3)}")
      res.failures
    } catch {
      case _: BatchTooLongException if batch.size > 1 =>
        val (a, b) = batch.splitAt(batch.size / 2)
        sendWithSplitRetry(a, send) ++ sendWithSplitRetry(b, send)
    }
  }

  /** Full partition pipeline: prepare → pack → send-with-retry. */
  def packAndSend(entries: Iterator[Entry],
      send: Seq[Entry] => SendResult): Seq[EntryFailure] =
    pack(entries).flatMap(b => sendWithSplitRetry(b, send)).toSeq
}
