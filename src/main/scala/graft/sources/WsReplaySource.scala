package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WebSocket-shaped streaming source: replays recorded frames through the
  * DataSource v2 `MicroBatchStream` contract.
  *
  * The reference's WS adapters (liq-stream `binance_adapter.py:96-129`,
  * `bybit_adapter.py:66-104`, `okx_adapter.py:109-129`,
  * `aster_adapter.py:91-124`) own three concerns beyond normalization:
  * a frame feed, protocol control frames (ping/pong), and reconnect with
  * backoff. This source maps each onto Spark's streaming contract:
  *
  *   - **frame feed** — a recorded-frames file (one frame per line, the
  *     docstring fixtures or captured traffic), consumed through monotonic
  *     per-frame offsets. New frames appended to the file are picked up on
  *     the next trigger, so a live capture process can feed a running query.
  *   - **ping/pong** — dropped inside the source, exactly where the
  *     reference handles them (`okx_adapter.py:119-124` string "ping" and
  *     JSON `{"event":"pong"}`; `bybit_adapter.py:84-90` `{"op":"ping"}`
  *     heartbeat): control frames advance the offset but emit no rows.
  *   - **reconnect ≈ task retry** — the partition reader is a pure function
  *     of its `[start, end)` offset slice, so a failed read (the analog of a
  *     dropped connection) is simply re-executed by Spark's task retry; the
  *     checkpointed offset log gives restart-without-replay across query
  *     restarts, which is *stronger* than the reference's reconnect (the
  *     WS feed has no server-side cursor — frames during an outage are
  *     lost; `binance_adapter.py:126-129` just reconnects and moves on).
  *
  * Offsets are frame indexes; admission control paces `framesPerBatch`
  * frames per micro-batch (the analog of the reference's batched flush —
  * `writer_pg.py:187-215` flushes on size∨time). Usage:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.WsReplayProvider")
  *   .option("path", framesFile)
  *   .option("framesPerBatch", 100)
  *   .load()                       // schema: frame_id LONG, raw STRING
  * }}}
  */
class WsReplayProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WsReplay.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WsReplayTable(new CaseInsensitiveStringMap(properties))
}

object WsReplay {
  val schema: StructType = StructType(Seq(
    StructField("frame_id", LongType, nullable = false),
    StructField("raw", StringType, nullable = true)))

  /** App-layer control frame? String "ping"/"pong" (OKX,
    * `okx_adapter.py:119-121`) or a JSON heartbeat `{"op":"ping"|"pong"}` /
    * `{"event":"ping"|"pong"}` (Bybit `bybit_adapter.py:84-90`, OKX JSON
    * pong `okx_adapter.py:122-124`). */
  def isControlFrame(line: String): Boolean = {
    val t = line.trim.toLowerCase
    t == "ping" || t == "pong" ||
      ((t.contains("\"op\"") || t.contains("\"event\"")) &&
        (t.contains("\"ping\"") || t.contains("\"pong\"")) && t.length < 120)
  }

  /** Frame count = line count; read lazily so only the driver pays it once
    * per trigger (fixture-scale files; a production capture would keep a
    * side index). Long arithmetic throughout — offsets must survive
    * multi-billion-frame captures. */
  def countFrames(path: String): Long = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      var n = 0L
      val it = src.getLines()
      while (it.hasNext) { it.next(); n += 1 }
      n
    } finally src.close()
  }
}

class WsReplayTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("ws-replay source requires option 'path'"))
  private val framesPerBatch = options.getInt("framesPerBatch", 1000)

  override def name(): String = s"ws-replay($path)"
  override def schema(): StructType = WsReplay.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WsReplay.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WsReplayMicroBatchStream(path, framesPerBatch)
      }
    }
}

/** Offset = number of frames fully consumed (frame index of the next frame
  * to read). */
case class WsOffset(frame: Long) extends Offset {
  override def json: String = frame.toString
}

class WsReplayMicroBatchStream(path: String, framesPerBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = WsOffset(0L)

  override def deserializeOffset(json: String): Offset = WsOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(framesPerBatch)

  /** Admission-controlled pacing: at most `framesPerBatch` new frames per
    * micro-batch (Trigger.Once's ReadAllAvailable takes everything),
    * re-counting the file each trigger so appended frames flow into later
    * batches. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[WsOffset].frame
    val total = WsReplay.countFrames(path)
    val cap = limit match {
      case rows: ReadMaxRows => from + rows.maxRows()
      case _: ReadAllAvailable => total
      case _ => from + framesPerBatch
    }
    WsOffset(math.max(from, math.min(cap, total)))
  }

  override def reportLatestOffset(): Offset = WsOffset(WsReplay.countFrames(path))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WsOffset].frame
    val e = end.asInstanceOf[WsOffset].frame
    if (e <= s) Array.empty
    else Array(WsReplayPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WsReplayReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class WsReplayPartition(path: String, start: Long, end: Long)
    extends InputPartition

class WsReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WsReplayPartition]
    new WsReplayReader(p.path, p.start, p.end)
  }
}

/** Deterministic replay of the frame slice `[start, end)` — idempotent under
  * task retry (the reconnect analog). Control frames consume an offset but
  * emit no row. */
class WsReplayReader(path: String, start: Long, end: Long)
    extends PartitionReader[InternalRow] {
  private val src = scala.io.Source.fromFile(path, "UTF-8")
  // Long frame indexes end to end: zipWithIndex/slice are Int-bounded and
  // would truncate past 2^31 frames
  private val lines = src.getLines()
    .scanLeft((null: String, -1L)) { case ((_, i), line) => (line, i + 1) }
    .drop(1)
    .dropWhile(_._2 < start)
    .takeWhile(_._2 < end)
    .filterNot { case (line, _) => WsReplay.isControlFrame(line) }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (lines.hasNext) {
      val (line, idx) = lines.next()
      current = InternalRow(idx, UTF8String.fromString(line))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
