package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** O16 — resumable position checkpointing.
  *
  * The PRIMARY position state is Structured Streaming's own
  * `checkpointLocation` (transactional with the batch — the reference's
  * send-then-save ordering, `coordinator.py:281-303`, is exactly Spark's
  * sink-commit-then-offset-commit WAL contract, O17). This trait is the
  * optional EXTERNAL MIRROR with the reference's DynamoDB item shape
  * `{PK: datasource_type, SK: source, position}`
  * (reference `stream_cdc/state/dynamodb.py:77-86`,
  * `dynamodb-config/init.sh:8-18`), fed by a [[PositionListener]].
  */
trait PositionStore {
  /** Persist position; returns false on failure
    * (reference `state/base.py:4-13`). */
  def store(datasourceType: String, source: String, position: String): Boolean
  /** Read last stored position, None when absent
    * (reference `dynamodb.py:96-122`). */
  def read(datasourceType: String, source: String): Option[String]
}

/** File-backed store: one JSON file per (type, source) pair, with the
  * reference's consecutive-duplicate dedupe (`coordinator.py:137-141`) so
  * an idle stream doesn't rewrite the same position every trigger.
  */
final class FilePositionStore(dir: String) extends PositionStore {
  Files.createDirectories(Paths.get(dir))
  private val last = TrieMap.empty[String, String]

  private def key(t: String, s: String) =
    s"${t}__${s.replaceAll("[^A-Za-z0-9._-]", "_")}"

  override def store(t: String, s: String, position: String): Boolean = {
    val k = key(t, s)
    if (last.get(k).contains(position)) return true // dedupe
    val json = s"""{"PK":${JsonUtil.escape(t)},"SK":${JsonUtil.escape(s)},""" +
      s""""position":${JsonUtil.escape(position)}}"""
    val tmp = Paths.get(dir, s"$k.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(dir, s"$k.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    last.put(k, position)
    true
  }

  override def read(t: String, s: String): Option[String] = {
    val p = Paths.get(dir, s"${key(t, s)}.json")
    if (!Files.exists(p)) None
    else {
      val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      JsonUtil.parseFlatObject(json).get("position") // full round-trip
    }
  }
}

object PositionStoreRegistry {
  val registry = new ComponentRegistry[PositionStore]("state_manager")
  registry.register("file", conf => new FilePositionStore(conf("dir")))
}

/** Mirrors each committed micro-batch's end offset into a
  * [[PositionStore]] — the Spark-native seam for the reference's
  * post-flush `save_state()` (`coordinator.py:110-159`). Listener events
  * fire AFTER batch commit, preserving the at-least-once ordering.
  */
final class PositionListener(store: PositionStore, datasourceType: String,
    source: String) extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val offsets = e.progress.sources.headOption
      .flatMap(s => Option(s.endOffset))
    offsets.foreach(o => store.store(datasourceType, source, o))
  }
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
