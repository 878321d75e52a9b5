package graft.sources

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 streaming source: ordered, resumable replay of the
  * events table with monotone event_id offsets — the engine's analogue
  * of the reference's GTID-positioned binlog tail
  * (`stream_cdc/datasources/mysql.py:367-402`; GTID `auto_position`
  * resume `mysql.py:224-227`).
  *
  * Semantics mapped from the reference:
  *  - **offset = last delivered event_id** (≈ GTID): checkpointed by
  *    Structured Streaming, resume is exact, duplicates impossible at
  *    the source (at-least-once end-to-end still governed by the sink).
  *  - **admission control** (`maxEventsPerTrigger`, default 10·batch):
  *    the flush policy's size cap (O10/O11) enforced AT the source, like
  *    the reference pulling ≤ batch_size events per poll
  *    (`coordinator.py:241-264`).
  *  - **offset-based pruning**: each micro-batch plans only the parquet
  *    ROW GROUPS whose event_id min/max statistics overlap
  *    (startExclusive, endInclusive] — the "server-side event filtering"
  *    of `only_events` + binlog position seek, expressed as footer-stats
  *    pruning. Row groups, not files, are the partition unit, so a
  *    single huge file still fans out across executors.
  *
  * Usage: `spark.readStream.format("graft-replay").option("path", dir)
  * .option("maxEventsPerTrigger", "1000").load()`.
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(properties.get("path"),
      Option(properties.get("maxEventsPerTrigger")).map(_.toLong)
        .getOrElse(10000L))
}

object ReplaySource {
  /** events replay schema; ts normalized to micros (TimestampType). */
  val schema: StructType = graft.streaming.CdcPipeline.eventsSchema
}

final class ReplayTable(path: String, maxPerTrigger: Long)
    extends Table with SupportsRead {
  require(path != null, "graft-replay requires .option(\"path\", dir)")
  override def name(): String = s"graft-replay($path)"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = () => new Scan {
    override def readSchema(): StructType = ReplaySource.schema
    override def toMicroBatchStream(checkpointLocation: String)
        : MicroBatchStream =
      new ReplayMicroBatchStream(path, maxPerTrigger)
  }
}

/** Offset = last delivered event_id (exclusive start of next batch). */
final case class ReplayOffset(lastEventId: Long) extends Offset {
  override def json(): String = s"""{"lastEventId":$lastEventId}"""
}

object ReplayOffset {
  def fromJson(j: String): ReplayOffset =
    ReplayOffset(""""lastEventId":(-?\d+)""".r
      .findFirstMatchIn(j).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $j")))
}

/** One parquet row group restricted to an event_id range. */
final case class ReplayInputPartition(file: String, rowGroup: Int,
    startExclusive: Long, endInclusive: Long) extends InputPartition

final class ReplayMicroBatchStream(path: String, maxPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: capture the drain target up front; batches
  // keep firing (still rate-capped) until the offset reaches it.
  // Without this interface Spark's wrapper would take the FIRST
  // rate-limited latestOffset as the final target and stop after one
  // batch.
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(maxEventId)

  /** (file, rowGroupIdx, minId, maxId) from parquet footers — read once
    * on the driver; this is the source's "binlog index". Listing goes
    * through the Hadoop FileSystem API, so `path` may be local, HDFS,
    * or an object store (s3a/gs/abfs) — whatever filesystems are on
    * the classpath — not just `java.io.File`. */
  private lazy val rowGroups: Seq[(String, Int, Long, Long)] = {
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          st.isFile && n.endsWith(".parquet") &&
            !n.startsWith(".") && !n.startsWith("_")
        }.map(_.getPath.toString).sorted.toSeq
      else Seq(path)
    files.flatMap { f =>
      // transient FS faults (networked object stores) retry with
      // jittered backoff; missing files and corrupt footers fail fast
      ReplayMicroBatchStream.connectRetry.connectWithRetry(() => {
        val in = HadoopInputFile.fromPath(new Path(f), conf)
        val reader = ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.zipWithIndex.map {
            case (block, i) =>
              val stats = block.getColumns.asScala
                .find(_.getPath.toDotString == "event_id")
                .map(_.getStatistics)
              val min = stats.map(_.genericGetMin
                .asInstanceOf[java.lang.Long].longValue).getOrElse(Long.MinValue)
              val max = stats.map(_.genericGetMax
                .asInstanceOf[java.lang.Long].longValue).getOrElse(Long.MaxValue)
              (f, i, min, max)
          }.toSeq
        } finally reader.close()
      }, ReplayMicroBatchStream.retriableIo)
    }
  }

  private lazy val maxEventId: Long =
    if (rowGroups.isEmpty) -1L else rowGroups.map(_._4).max

  override def initialOffset(): Offset = ReplayOffset(-1L)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ReplayOffset].lastEventId
    val cap = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => maxPerTrigger
    }
    // event_ids are dense and monotone in the replay table, so the rate
    // cap is an offset delta (≈ "pull at most batch_size events").
    val target = availableNowTarget.getOrElse(maxEventId)
    ReplayOffset(math.min(target, from + cap))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(maxEventId)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[ReplayOffset].lastEventId
    val hi = end.asInstanceOf[ReplayOffset].lastEventId
    rowGroups
      .filter { case (_, _, min, max) => max > lo && min <= hi }
      .map { case (f, i, _, _) =>
        ReplayInputPartition(f, i, lo, hi): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ReplayInputPartition]
      new ReplayPartitionReader(p)
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object ReplayMicroBatchStream {
  /** Driver-side connect retry (SURVEY §2.1 S3): 3 attempts with
    * jittered exponential backoff, shared across the stream's footer
    * reads. */
  val connectRetry: graft.streaming.RetryPolicy =
    graft.streaming.RetryPolicy(maxRetries = 3)

  /** Transient-IO classifier: generic IOExceptions (network blips,
    * throttled object stores) retry; a missing file is a configuration
    * error and fails fast. */
  def retriableIo(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException => false
    case _: java.io.IOException => true
    case _ => false
  }
}

/** Executor-side reader: opens the file, seeks to its row group, and
  * streams records matching the offset range. */
final class ReplayPartitionReader(p: ReplayInputPartition)
    extends PartitionReader[InternalRow] {

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(p.file), new Configuration()))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val recordReader = {
    var skipped = 0
    while (skipped < p.rowGroup) { reader.skipNextRowGroup(); skipped += 1 }
    val store = reader.readNextRowGroup()
    new ColumnIOFactory().getColumnIO(fileSchema)
      .getRecordReader(store, new GroupRecordConverter(fileSchema))
  }
  private val rowsInGroup =
    reader.getFooter.getBlocks.get(p.rowGroup).getRowCount
  private var readCount = 0L
  private var current: InternalRow = _

  // ts physical/logical type varies by writer: the driver's testdata is
  // INT64 TIMESTAMP(NANOS), Spark-restaged sources default to INT96
  // (julian day + nanos-of-day). Normalize every variant to micros.
  private val tsToMicros: org.apache.parquet.example.data.Group => Long = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val prim = fileSchema.getType(fileSchema.getFieldIndex("ts"))
      .asPrimitiveType()
    if (prim.getPrimitiveTypeName == PrimitiveTypeName.INT96) { g =>
      val bytes = g.getInt96("ts", 0).getBytes // 8B nanos LE + 4B julian LE
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nanosOfDay = bb.getLong
      val julianDay = bb.getInt
      (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
    } else {
      val conv: Long => Long = prim.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.NANOS => v => v / 1000L
            case TimeUnit.MILLIS => v => v * 1000L
            case _ => v => v
          }
        case _ => v => v
      }
      g => conv(g.getLong("ts", 0))
    }
  }

  override def next(): Boolean = {
    while (readCount < rowsInGroup) {
      val g = recordReader.read()
      readCount += 1
      val id = g.getLong("event_id", 0)
      if (id > p.startExclusive && id <= p.endInclusive) {
        current = new GenericInternalRow(Array[Any](
          id,
          tsToMicros(g),
          g.getLong("user_id", 0),
          UTF8String.fromString(g.getString("event_type", 0)),
          g.getDouble("value", 0),
          UTF8String.fromString(g.getString("props", 0))))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
