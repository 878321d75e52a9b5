package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.UUID
import scala.collection.concurrent.TrieMap

import graft.streaming.BatchPacker.{Entry, SendResult}

/** Queue sink abstraction (reference `stream_cdc/streams/base.py`) with a
  * file-backed local implementation standing in for SQS offline
  * (SURVEY.md §7.1 step 4). Implementations must be constructible from a
  * plain config map ON THE EXECUTOR — the pipeline instantiates one per
  * partition inside `foreachPartition`, which is exactly how a real SQS
  * client would be scoped on a 1000-executor cluster (one client per JVM
  * task, no driver round-trip).
  */
trait QueueSink {
  /** Deliver one packed batch; per-entry failures in the result
    * (reference `sqs.py:149-203`). */
  def send(batch: Seq[Entry]): SendResult
  /** Final drain hook (reference `sqs.py:378-384` — no-op for SQS). */
  def close(): Unit = ()
}

/** Writes each batch as one JSONL file under `dir` — the offline
  * stand-in for an SQS request. File names are unique per
  * (partition, attempt) so speculative/retried tasks never collide;
  * at-least-once semantics match the reference (SURVEY.md §7.4.2).
  */
final class LocalFileQueue(dir: String) extends QueueSink {
  Files.createDirectories(Paths.get(dir))
  override def send(batch: Seq[Entry]): SendResult = {
    val name = s"batch-${UUID.randomUUID()}.jsonl"
    // bodies that are themselves valid JSON embed verbatim; anything
    // else (arbitrary strings with quotes/newlines) is escaped, so the
    // output file is always parseable JSONL
    val lines = batch.map(e =>
      s"""{"id":${JsonUtil.escape(e.id)},"source":${JsonUtil.escape(e.source)},"oversized":${e.oversized},"body":${
        if (JsonUtil.isValidJson(e.body)) e.body
        else JsonUtil.escape(e.body)}}""")
    Files.write(Paths.get(dir, name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    SendResult.ok
  }
}

/** O20 — component registry with case-insensitive lookup and
  * UnsupportedTypeError on miss (reference `streams/factory.py:16-56`,
  * `datasources/factory.py:16-60`, `state/factory.py:12-47`).
  */
final class UnsupportedTypeError(kind: String, name: String)
  extends IllegalArgumentException(s"unsupported $kind type: $name")

final class ComponentRegistry[T](kind: String) {
  private val impls = TrieMap.empty[String, Map[String, String] => T]
  def register(name: String, make: Map[String, String] => T): Unit =
    impls.put(name.toLowerCase, make)
  def create(name: String, conf: Map[String, String] = Map.empty): T =
    factoryFor(name)(conf)
  /** Resolve the factory FUNCTION (for shipping to executors: a name
    * looked up in this JVM-local registry would not resolve in executor
    * JVMs, where only built-ins are registered — the function itself
    * must travel in the task closure). */
  def factoryFor(name: String): Map[String, String] => T =
    impls.getOrElse(name.toLowerCase,
      throw new UnsupportedTypeError(kind, name))
  def registered: Set[String] = impls.keySet.toSet
}

/** In-JVM collecting queue for tests and local-mode smoke runs. Keyed
  * by name in a process-global map — meaningful on local[*] only (on a
  * cluster each executor JVM would collect its own slice; use the file
  * queue there). */
final class MemoryQueue(name: String) extends QueueSink {
  override def send(batch: Seq[Entry]): SendResult = {
    MemoryQueue.append(name, batch)
    SendResult.ok
  }
}

object MemoryQueue {
  private val queues =
    TrieMap.empty[String, java.util.concurrent.ConcurrentLinkedQueue[Entry]]
  private def append(name: String, batch: Seq[Entry]): Unit = {
    val q = queues.getOrElseUpdate(name,
      new java.util.concurrent.ConcurrentLinkedQueue[Entry]())
    batch.foreach(q.add)
  }
  def drain(name: String): Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    queues.remove(name).map(_.asScala.toSeq).getOrElse(Nil)
  }
}

object QueueSinkRegistry {
  val registry = new ComponentRegistry[QueueSink]("stream")
  registry.register("file", conf => new LocalFileQueue(conf("dir")))
  registry.register("memory",
    conf => new MemoryQueue(conf.getOrElse("name", "default")))
  def create(name: String, conf: Map[String, String]): QueueSink =
    registry.create(name, conf)
}
