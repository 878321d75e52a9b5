package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.streaming.BatchPacker._

/** Property tests for the packer invariants (SURVEY.md §5 test plan):
  * every batch ≤10 entries and ≤262,000 bytes; no event lost; oversize
  * events always produce a stub. */
class BatchPackerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val bodyGen: Gen[String] =
    Gen.chooseNum(0, 4000).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val entriesGen: Gen[List[Entry]] =
    Gen.listOf(bodyGen.map(b => Entry("id", b, oversized = false)))

  test("pack: batch limits hold and nothing is lost or reordered") {
    check(Prop.forAll(entriesGen) { entries =>
      val batches = pack(entries.iterator).toList
      // a single entry may exceed MaxBatchBytes only if alone pre-claim-
      // check; with prepare() applied it can't. Multi-entry batches obey.
      batches.forall(b => b.nonEmpty && b.size <= MaxBatchMessages &&
        (b.size == 1 || b.map(_.byteSize).sum <= MaxBatchBytes)) &&
        batches.flatten == entries
    })
  }

  test("prepare: oversized bodies become claim-check stubs") {
    val big = "x" * (MaxMessageBytes.toInt + 1)
    val e = prepare("m-1", big,
      Map("event_type" -> "Insert", "database" -> "app", "table" -> "t"))
    assert(e.oversized)
    assert(e.byteSize < 1024)
    assert(e.body.contains("\"original_size_exceeded\":true"))
    assert(e.body.contains("\"message_id\":\"m-1\""))
    assert(e.body.contains("\"event_type\":\"Insert\""))
    val small = prepare("m-2", "hello")
    assert(!small.oversized && small.body == "hello")
  }

  test("prepare: minimal stub when no locator fields present") {
    val e = prepare("m-3", "y" * (MaxMessageBytes.toInt + 1))
    assert(e.oversized)
    assert(e.body ==
      """{"original_size_exceeded":true,"message_type":"reference","message_id":"m-3"}""")
  }

  test("split-retry: halves on BatchTooLong and delivers everything") {
    val entries = (1 to 10).map(i => Entry(s"e$i", s"body$i", false))
    var sent = Vector.empty[Seq[Entry]]
    val maxOk = 3
    val send: Seq[Entry] => SendResult = b =>
      if (b.size > maxOk) throw new BatchTooLongException("too long")
      else { sent :+= b; SendResult.ok }
    val failures = sendWithSplitRetry(entries, send)
    assert(failures.isEmpty)
    assert(sent.flatten == entries)
    assert(sent.forall(_.size <= maxOk))
  }

  test("partial failure: raises only when ALL entries failed") {
    val entries = (1 to 4).map(i => Entry(s"e$i", "b", false))
    val partial: Seq[Entry] => SendResult =
      b => SendResult(b.take(1).map(e => EntryFailure(e.id, "Err", true)))
    assert(sendWithSplitRetry(entries, partial).size == 1)
    val total: Seq[Entry] => SendResult =
      b => SendResult(b.map(e => EntryFailure(e.id, "Err", false)))
    intercept[AllEntriesFailedException] {
      sendWithSplitRetry(entries, total)
    }
  }

  test("retriable taxonomy mirrors the reference (sqs.py:317-345)") {
    // receiver-fault failures always retry, whatever the code
    assert(EntryFailure("e1", "WhateverError", senderFault = false).retriable)
    // sender-fault failures retry only on the transient codes
    assert(EntryFailure("e2", "InternalError", senderFault = true).retriable)
    assert(EntryFailure("e3", "ServiceUnavailable", senderFault = true).retriable)
    assert(EntryFailure("e4", "ThrottlingException", senderFault = true).retriable)
    assert(!EntryFailure("e5", "InvalidMessageContents",
      senderFault = true).retriable)
    // batch decision: ANY retriable failure -> retry
    assert(shouldRetry(Seq(
      EntryFailure("a", "InvalidMessageContents", senderFault = true),
      EntryFailure("b", "ThrottlingException", senderFault = true))))
    assert(!shouldRetry(Seq(
      EntryFailure("a", "InvalidMessageContents", senderFault = true))))
    assert(!shouldRetry(Nil))
  }

  test("source attribute: default, explicit, carried onto stubs and JSONL") {
    assert(prepare("m-1", "hello").source == "stream_cdc")
    val stub = prepare("m-2", "z" * (MaxMessageBytes.toInt + 1),
      Map.empty, source = "orders-feed")
    assert(stub.oversized && stub.source == "orders-feed")
    val dir = java.nio.file.Files.createTempDirectory("srcattr").toString
    new LocalFileQueue(dir).send(Seq(stub.copy(body = "{}"),
      prepare("m-3", "small", Map.empty, "orders-feed")))
    val lines = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().next()
    val content = new String(java.nio.file.Files.readAllBytes(lines), "UTF-8")
    assert(content.linesIterator.forall(_.contains("\"source\":\"orders-feed\"")))
  }

  test("flush policy parity: size OR time, whichever first") {
    val p = FlushPolicy(batchSize = 10, flushIntervalSec = 5.0)
    assert(p.shouldFlush(10, 0, 1000))      // size reached
    assert(p.shouldFlush(0, 0, 5000))       // time reached
    assert(!p.shouldFlush(9, 0, 4999))      // neither
    intercept[IllegalArgumentException](FlushPolicy(batchSize = 0))
  }
}
